from transformer4sed_tpu.models.sed_model import SEDOutput

__all__ = ["SEDOutput"]
