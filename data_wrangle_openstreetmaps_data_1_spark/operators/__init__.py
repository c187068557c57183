from . import asof, audit, clean, dedup, geo_queries, reshape, sessionize, similarity

__all__ = [
    "asof",
    "audit",
    "clean",
    "dedup",
    "geo_queries",
    "reshape",
    "sessionize",
    "similarity",
]
