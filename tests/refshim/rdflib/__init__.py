"""Minimal rdflib stub: just enough surface for the reference's
nomenclature/token modules to import and build string-like nodes."""


class Literal(str):
    def __new__(cls, value, datatype=None, **kw):
        obj = super().__new__(cls, str(value))
        obj.datatype = datatype
        return obj


class URIRef(str):
    pass


class Namespace(str):
    def term(self, name):
        return URIRef(self + name)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return URIRef(self + name)


class Graph:
    def __init__(self, *a, **k):
        self._triples = set()

    def add(self, t):
        self._triples.add(t)


from . import namespace  # noqa: E402,F401
