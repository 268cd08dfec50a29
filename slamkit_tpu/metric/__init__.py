from .modelling_metric import modelling_metric, salmon, sblimp, storycloze, swuggy

__all__ = ["modelling_metric", "salmon", "sblimp", "storycloze", "swuggy"]
