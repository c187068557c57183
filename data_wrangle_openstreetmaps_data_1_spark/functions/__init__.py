from . import cleaning, geo, hashing, text, vectors

__all__ = ["cleaning", "geo", "hashing", "text", "vectors"]
