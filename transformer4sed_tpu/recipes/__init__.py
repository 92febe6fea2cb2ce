from transformer4sed_tpu.recipes import (
    audioset_strong,
    common,
    dasm_recipe,
    matsed,
    queries,
)

__all__ = ["audioset_strong", "common", "dasm_recipe", "matsed", "queries"]
