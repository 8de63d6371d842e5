from .loss import diffusion_loss, forward_process, sample_t  # noqa: F401
