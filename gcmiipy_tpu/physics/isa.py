"""International Standard Atmosphere temperature profile.

JAX twin of reference ``standard_atmosphere_isa.py``: an 8-point pressure ->
temperature interpolation table (reference ``standard_atmosphere_isa.py:6-11``)
used to initialize columns.  SI units (the reference stores Celsius and
converts with ``.to_base_units()``).
"""

import jax.numpy as jnp
import numpy as np

# (reference standard_atmosphere_isa.py:6-7; Celsius converted to Kelvin)
ISA_PRESSURES_PA = np.asarray(
    [0.3734, 3.9564, 66.939, 110.91, 868.02, 5474.9, 22632.0, 108900.0]
)
ISA_TEMPERATURES_K = np.asarray(
    [-86.28, -58.5, -2.5, -2.5, -44.5, -56.5, -56.5, 19.0]
) + 273.15


def temp_at(p):
    """ISA temperature [K] at pressure ``p`` [Pa] (reference standard_atmosphere_isa.py:10-11)."""
    dtype = jnp.result_type(p, jnp.float32)
    return jnp.interp(p, jnp.asarray(ISA_PRESSURES_PA, dtype),
                      jnp.asarray(ISA_TEMPERATURES_K, dtype))
