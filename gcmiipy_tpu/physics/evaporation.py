"""Surface evaporation (stub).

The reference declares this subsystem but never implements it — an empty
function with a design docstring (reference ``evaporation.py:5-9``,
SURVEY.md section 2 #15).  Kept as an explicit stub so the component exists
at the same place in the API; wire a bulk-aerodynamic flux here when the
ground hydrology (GroundVars.gw) becomes prognostic.
"""


def evaporation(tt, gt, gw, wind_speed, rh):
    """Evaporative water flux from the ground into the lowest layer.

    Not implemented in the reference (evaporation.py:5-9); raises to make
    accidental use loud rather than silently wrong.
    """
    raise NotImplementedError(
        "evaporation is declared but unimplemented in the reference; "
        "see gcmiipy_tpu/physics/evaporation.py for the intended design")
