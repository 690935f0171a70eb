from .synthetic import SyntheticEventsDataSource, register

__all__ = ["SyntheticEventsDataSource", "register"]
