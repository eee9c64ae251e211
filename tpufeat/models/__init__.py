from tpufeat.models import encoder, train  # noqa: F401
