from transformer4sed_tpu.recipes import common, matsed

__all__ = ["common", "matsed"]
