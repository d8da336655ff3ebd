"""Hparams handling for the conditional denoiser.

The reference drives model construction from the JSON `pointnet_config`
section (exp_configs/mvp_configs/*.json).  We accept the same dict schema;
`freeze_config` makes it hashable (nested tuples) so it can live as a static
field on a Flax module.
"""

from __future__ import annotations

from typing import Any, Mapping


class FrozenCfg(Mapping):
    """Immutable, hashable nested view of a config dict."""

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_items", tuple(sorted(
            (k, _freeze(v)) for k, v in data.items()
        )))
        object.__setattr__(self, "_map", dict(self._items))

    def __getitem__(self, k):
        return self._map[k]

    def __iter__(self):
        return iter(self._map)

    def __len__(self):
        return len(self._map)

    def get(self, k, default=None):
        return self._map.get(k, default)

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, FrozenCfg) and self._items == other._items

    def __repr__(self):
        return f"FrozenCfg({dict(self._items)!r})"


def _freeze(v):
    if isinstance(v, Mapping):
        return FrozenCfg(v)
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def freeze_config(d: Mapping[str, Any]) -> FrozenCfg:
    return d if isinstance(d, FrozenCfg) else FrozenCfg(d)
