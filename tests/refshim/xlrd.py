"""Stub: the reference imports xlrd for excel; differential tests only
use the text paths."""
class biffh:
    class XLRDError(Exception):
        pass
