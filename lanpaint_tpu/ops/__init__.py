from . import stable, sho  # noqa: F401
