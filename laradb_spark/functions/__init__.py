from .semiring import PLUS, TIMES, ExtFun, MapFun, PlusFun, TimesFun, plus, times

__all__ = ["PLUS", "TIMES", "ExtFun", "MapFun", "PlusFun", "TimesFun", "plus", "times"]
