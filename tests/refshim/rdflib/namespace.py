from . import Namespace

RDFS = Namespace("http://www.w3.org/2000/01/rdf-schema#")
OWL = Namespace("http://www.w3.org/2002/07/owl#")
XSD = Namespace("http://www.w3.org/2001/XMLSchema#")


class NamespaceManager:
    def __init__(self, graph):
        pass

    def bind(self, *a, **k):
        pass
