from .core import det_round, exact_sum, money_sum, ratio

__all__ = ["det_round", "exact_sum", "money_sum", "ratio"]
