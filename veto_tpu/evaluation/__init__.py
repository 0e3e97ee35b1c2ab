from .sgg_eval import SGGEvaluator

__all__ = ["SGGEvaluator"]
