from .deterministic import DEC, davg, dsum, sql_davg, sql_dsum  # noqa: F401
