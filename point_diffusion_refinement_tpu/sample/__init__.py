from .generate import make_coarse_sampler, make_refiner, unaugment

__all__ = ["make_coarse_sampler", "make_refiner", "unaugment"]
from .evaluate import evaluate, EvalResult
__all__ += ["evaluate", "EvalResult"]
from .pipeline import gather_generated_results, run_generation
__all__ += ["gather_generated_results", "run_generation"]
