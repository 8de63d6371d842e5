from .diffusion import generate, prefill  # noqa: F401
