from . import ntriples  # noqa: F401
