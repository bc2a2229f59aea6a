from mixofshow_tpu.ops.solve import (anchored_spectral_solve, gram,
                                     solve_layer_group)

__all__ = ['anchored_spectral_solve', 'gram', 'solve_layer_group']
