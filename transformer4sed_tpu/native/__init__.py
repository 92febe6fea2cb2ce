from transformer4sed_tpu.native.build import load_psds_core

__all__ = ["load_psds_core"]
