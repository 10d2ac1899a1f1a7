"""Stub: the reference imports SPARQLWrapper only for a type
annotation; differential tests never touch the network paths."""
class SPARQLWrapper:
    pass
