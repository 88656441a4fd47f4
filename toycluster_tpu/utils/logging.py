"""Structured stage logging.

The reference's printf tables are its de-facto UX (unit.c:9-17,
setup.c:117-142, wvt_relax.c:91-92); we reproduce the key stage reports
through one logger that also records machine-readable metrics.
"""

from __future__ import annotations

import json
import sys
import time

_T0 = time.perf_counter()
METRICS: list = []


def stage_log(stage: str, **kw):
    t = time.perf_counter() - _T0
    scene = kw.pop("scene", None)
    rec = {"t": round(t, 3), "stage": stage, **{k: v for k, v in kw.items()
                                                if _jsonable(v)}}
    METRICS.append(rec)
    msg = f"[{t:8.2f}s] {stage}"
    if scene is not None:
        msg += (f": nhalos={scene.nhalos} box={scene.boxsize:g} "
                f"ngas={scene.npart_gas} ndm={scene.npart_dm}")
        for h in scene.halos:
            msg += (f"\n            halo<{h.index}> M200={h.mtotal200:g} "
                    f"R200={h.r200:.1f} c={h.c_nfw:.3f} a={h.a_hernq:.1f} "
                    f"rc={h.rcore:.2f} rho0={h.rho0:g} bf500={h.bf_eff:.3f}")
    else:
        extras = " ".join(f"{k}={v}" for k, v in kw.items())
        if extras:
            msg += ": " + extras
    print(msg, file=sys.stderr, flush=True)


def _jsonable(v):
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


def silent_log(stage: str, **kw):
    pass
