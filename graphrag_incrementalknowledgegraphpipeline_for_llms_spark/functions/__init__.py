from . import purecore  # noqa: F401
