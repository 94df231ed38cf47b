from . import sh, projection  # noqa: F401
