"""Stub for differential testing (reference imports it for logging)."""
def colored(x, *a, **k):
    return x
