from .freebase import (
    FreebaseNode,
    clean_uri,
    freebase_node_docs,
    freebase_nodes,
    freebase_uri_to_freebase_id,
    get_object_type,
    lookup_freebase_node,
    normalize_object_value,
    read_freebase_triples,
)

__all__ = [
    "FreebaseNode", "clean_uri", "normalize_object_value", "get_object_type",
    "freebase_uri_to_freebase_id", "freebase_nodes", "read_freebase_triples",
    "freebase_node_docs", "lookup_freebase_node",
]
