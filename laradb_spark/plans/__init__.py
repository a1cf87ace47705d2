from .raco import RacoPlan, parse_raco

__all__ = ["RacoPlan", "parse_raco"]
