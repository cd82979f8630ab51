"""Interaction coefficients for Rydberg levels between 50 and 100.

Stored values and units (physical constants, identical to the reference
``pulser-core/pulser/devices/interaction_coefficients``):
- C_6/hbar: rad/µs x µm^6
- C_3/hbar: rad/µs x µm^3

The values were originally calculated using ARC and double checked with
PairInteraction.
"""

import json
from pathlib import PurePath

with open(
    PurePath(__file__).parent / "C6_coeffs.json", "r", encoding="utf-8"
) as f:
    _json_dict = json.load(f)
c6_dict = {int(key): value for key, value in _json_dict.items()}

with open(
    PurePath(__file__).parent / "C3_coeffs.json", "r", encoding="utf-8"
) as f:
    _json_dict = json.load(f)
c3_dict = {int(key): value for key, value in _json_dict.items()}
