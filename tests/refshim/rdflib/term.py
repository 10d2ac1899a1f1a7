from . import Literal, URIRef  # noqa: F401


class Node:
    pass
