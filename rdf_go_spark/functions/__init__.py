from .jcs import canonicalize_json  # noqa: F401
