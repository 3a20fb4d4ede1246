"""Reference README 'Customizing Materials' (README.md:180-202): extend the
material registry and simulate against it.

Note the coefficient scale: the reference multiplies ``freq`` by the
frequency in Hz (SURVEY.md Q2 — its default values underflow every image
source to zero).  Physically sensible tables keep absorption per meter and
freq-coefficients that stay finite at audio frequencies, as below.
"""

import jax
import numpy as np

from pyaudiolocalization_tpu import material_properties, MaterialTable
from pyaudiolocalization_tpu import simulate_signals_with_multipath
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

# Extend the registry exactly like the reference README shows.
material_properties["glass"] = {"absorption": 0.07, "freq": 0.5}

# Or build an explicit, physically-scaled table (per-meter coefficients).
physical = {
    "air": {"absorption": 0.01, "freq": 1e-5},
    "wood": {"absorption": 0.05, "freq": 5e-5},
    "metal": {"absorption": 0.10, "freq": 3e-5},
    "glass": {"absorption": 0.07, "freq": 4e-5},
}

c = float(speed_of_sound(20.0, 50.0))
signals = simulate_signals_with_multipath(
    [0.5, 0.5, 0.5],
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
    16000, c, duration=0.25, signal_type="chirp",
    reflective_planes=[
        {"plane": [1, 0, 0, -3], "material": "glass"},
        {"plane": [0, 1, 0, -3], "material": "wood"},
    ],
    material_properties=physical,
    max_reflections=2,
    key=jax.random.PRNGKey(0))
print("Simulated", len(signals), "mic signals;",
      "peak amplitudes:", [float(np.abs(s).max()) for s in signals])
print("Material ids:", MaterialTable.from_dict(physical).ids)
