from tpufeat.models import encoder, train, xvector  # noqa: F401
