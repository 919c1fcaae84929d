"""Unit system for theia_tpu.

Physical quantities are plain floats annotated by multiplying with a unit
constant (``5.0 * u.m``) and converted back by dividing (``x / u.cm``).
Internal base units are chosen so the speed of light is ~0.3:

* length:      meter  [m]
* time:        nanosecond [ns]
* wavelength:  nanometer [nm]
* energy:      GeV
* angle:       radian

This mirrors the unit conventions of the reference implementation
(reference: src/theia/units.py:190-223) but uses plain floats rather than a
``Unit`` wrapper class: on TPU every quantity is a traced array and the
annotation-by-multiplication idiom works unchanged.
"""

from __future__ import annotations

import math

__all__ = [
    # length
    "km", "m", "dm", "cm", "mm", "um", "nm",
    # inverse length
    "per_km", "per_m", "per_dm", "per_cm", "per_mm",
    # area
    "m2", "cm2", "mm2",
    # time
    "s", "ms", "us", "ns", "ps",
    # frequency
    "GHz", "MHz", "kHz", "Hz",
    # angle
    "rad", "deg",
    # energy
    "PeV", "TeV", "GeV", "MeV", "keV", "eV",
    # physics constants
    "c", "speed_of_light",
]

# length (base: meter)
km = 1e3
m = 1.0
dm = 1e-1
cm = 1e-2
mm = 1e-3
um = 1e-6
nm = 1.0  # NOTE: wavelengths are expressed in nanometer (separate dimension)

per_km = 1e-3
per_m = 1.0
per_dm = 1e1
per_cm = 1e2
per_mm = 1e3

m2 = 1.0
cm2 = 1e-4
mm2 = 1e-6

# time (base: nanosecond)
s = 1e9
ms = 1e6
us = 1e3
ns = 1.0
ps = 1e-3

# frequency (base: 1/ns = GHz)
GHz = 1.0
MHz = 1e-3
kHz = 1e-6
Hz = 1e-9

# angle (base: radian)
rad = 1.0
deg = math.pi / 180.0

# energy (base: GeV)
PeV = 1e6
TeV = 1e3
GeV = 1.0
MeV = 1e-3
keV = 1e-6
eV = 1e-9

#: speed of light in internal units [m/ns]
speed_of_light = 0.299792458
c = speed_of_light
