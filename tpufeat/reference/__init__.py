from tpufeat.reference import cpu  # noqa: F401
