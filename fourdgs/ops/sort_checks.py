"""On-device sort validators — the analog of the reference's GPU self-check
compute shaders shipped with GPU_RADIX_SORT (SURVEY.md section 4.1):

  * sort_test_check_sorted.comp.glsl  -> is_sorted (monotonicity + error count)
  * sort_test_arr_compare.comp.glsl   -> arrays_equal (elementwise + mask)
  * sort_test_count_elements.comp.glsl -> is_permutation (histogram equality)

All run inside jit on device; used by the test suite and as debug assertions
around the binning sort.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def is_sorted(keys: jax.Array, ascending: bool = True) -> Tuple[jax.Array, jax.Array]:
    """(ok, error_count): monotonicity check with an error counter, like the
    atomic counter in sort_test_check_sorted.comp.glsl:24-36."""
    diff = keys[1:] - keys[:-1]
    bad = (diff < 0) if ascending else (diff > 0)
    errors = jnp.sum(bad.astype(jnp.int32))
    return errors == 0, errors


def arrays_equal(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(ok, error_mask) — sort_test_arr_compare.comp.glsl:25-39."""
    mask = a != b
    return ~jnp.any(mask), mask


def is_permutation(idx: jax.Array, n: int) -> jax.Array:
    """True iff idx is a permutation of [0, n) — the histogram check of
    sort_test_count_elements.comp.glsl:23-33 (each element appears once)."""
    counts = jnp.zeros((n,), jnp.int32).at[idx].add(1)
    return jnp.all(counts == 1)
