"""Wind-driven ambience mixing law (reference C20 behavior).

The reference cross-fades two ambience loops by total wind speed
(main.gd:39-44): ocean volume rises and wind-whistle volume falls as the
summed cascade wind speed approaches 15 m/s. The audio assets themselves are
out of scope; this reproduces the *control law* so any host audio stack can
drive it, plus a dB->linear helper.
"""
from __future__ import annotations

import numpy as np


def ambience_gains_db(total_wind_speed: float) -> tuple[float, float]:
    """(ocean_db, wind_db) for the summed wind speed across cascades."""
    t = min(total_wind_speed / 15.0, 1.0)
    ocean_db = -30.0 + (15.0 - (-30.0)) * t    # lerp(-30, 15, t)  main.gd:42
    wind_db = 5.0 + (-30.0 - 5.0) * t          # lerp(5, -30, t)   main.gd:43
    return ocean_db, wind_db


def db_to_linear(db: float) -> float:
    return float(10.0 ** (db / 20.0))


def ambience_gains(params) -> tuple[float, float]:
    """Linear gains from a CascadeParams stack."""
    total = float(np.asarray(params.wind_speed).sum())
    o, w = ambience_gains_db(total)
    return db_to_linear(o), db_to_linear(w)
