from .grouping import CppGrouping, make_groups_native

__all__ = ["CppGrouping", "make_groups_native"]
