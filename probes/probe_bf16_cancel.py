"""Probe: is a bf16 dense pass (VERDICT r2 #1 / round-4 handoff lever
"bf16 with banded f32 re-test") numerically viable on the bench scenes?

The SO signed-volume decision values are sums of products whose TERMS
scale like |a||e| ~ (camera distance D) x (edge length s), while the
DECISIONS live at the s^2 scale (the values vanish on the triangle's
edge planes, and interior magnitudes are ~area-sized). The sums cancel
by a factor kappa ~ D/s, so ANY finite-precision evaluation carries an
absolute error ~eps * kappa relative to the decision scale. bf16's
eps = 2^-8 needs kappa << 256 to leave a usable margin; this probe
measures the real kappa distribution on the two bench scenes and
emulates the bf16 pipeline (inputs + every intermediate rounded) on
known-interior hits to count sign-test misclassifications directly.

Pure numpy, runs on CPU in seconds:

  python probes/probe_bf16_cancel.py
"""

import json

import numpy as np


def to_bf16(x):
    """Round-to-nearest-even f32 -> bf16 -> f32 (numpy emulation)."""
    u = np.asarray(x, np.float32).view(np.uint32)
    rounded = (u + 0x7FFF + ((u >> 16) & 1)) & 0xFFFF0000
    return rounded.view(np.float32)


def so_terms(o, v0, v1, v2, rnd=lambda x: x):
    """Shared-origin signed-volume coefficient rows (ops/packet.py::
    so_rows math) with an injectable per-step rounding `rnd`."""
    a = rnd(v0 - o)
    e1 = rnd(v1 - v0)
    e2 = rnd(v2 - v0)
    w1 = rnd(np.cross(a, e1))
    w2 = rnd(np.cross(a, e2))
    nrm = rnd(np.cross(e1, e2))
    ab = w1
    bc = rnd(rnd(w2 - w1) + nrm)
    ca = -w2
    d0 = rnd((rnd(a * nrm)).sum(1))
    return ab, bc, ca, d0


def s_values(ab, bc, ca, d, rnd=lambda x: x):
    """s_i = c_i . d with per-op rounding; also the abs-term sums that
    bound the rounding error (the would-be conservative margins)."""
    def dot(c):
        p = rnd(c * d)
        return rnd(rnd(p[:, 0] + p[:, 1]) + p[:, 2])

    s1, s2, s3 = dot(ab), dot(bc), dot(ca)
    dsum = rnd(rnd(s1 + s2) + s3)
    terms = (np.abs(ab * d).sum(1) + np.abs(bc * d).sum(1)
             + np.abs(ca * d).sum(1))
    return s1, s2, s3, dsum, terms


def main():
    from clpathtracer_tpu.scene.procedural import random_tri_soup, \
        terrain_mesh

    out = {}
    for kind in ("terrain", "soup"):
        if kind == "terrain":
            scene = terrain_mesh(200_000, seed=0, extent=10.0)
            o = np.array([0.0, 14.0, 0.0], np.float32)
        else:
            scene = random_tri_soup(200_000, seed=0, extent=10.0,
                                    tri_size=0.01)
            o = np.array([0.0, 0.0, -25.0], np.float32)
        v0, v1, v2 = [np.asarray(v, np.float32) for v in scene.tri_verts()]
        rng = np.random.default_rng(0)
        n = v0.shape[0]

        # rays through interior points of each triangle: u,v sampled
        # strictly inside — these are TRUE HITS a sound filter must keep
        u = rng.uniform(0.1, 0.8, (n, 1)).astype(np.float32)
        v = (rng.uniform(0.1, 0.9, (n, 1)) * (1.0 - u - 0.1)).astype(
            np.float32)
        p = v0 + u * (v1 - v0) + v * (v2 - v0)
        d = p - o
        d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(
            np.float32)

        # exact (f64) vs bf16-emulated pipeline
        ab, bc, ca, d0 = so_terms(o.astype(np.float64), v0.astype(
            np.float64), v1.astype(np.float64), v2.astype(np.float64))
        s1, s2, s3, dsum, terms = s_values(ab, bc, ca, d.astype(
            np.float64))
        abb, bcb, cab, d0b = so_terms(o, v0, v1, v2, rnd=to_bf16)
        b1, b2, b3, dsb, _ = s_values(abb, bcb, cab, to_bf16(d),
                                      rnd=to_bf16)

        # backface-culled orientation: the kernel needs all s_i <= 0 and
        # dsum < 0; flip to the canonical sign per triangle
        flip = -np.sign(dsum)
        true_hit = ((np.maximum(np.maximum(s1 * flip, s2 * flip),
                                s3 * flip) <= 0) & (dsum * flip < 0))
        bf_hit = ((np.maximum(np.maximum(b1 * flip, b2 * flip),
                              b3 * flip) <= 0) & (dsb * flip < 0))
        keep = true_hit  # interior by construction (up to f64 noise)

        kappa = terms / np.maximum(np.abs(dsum), 1e-300)
        t_true = d0 / dsum
        t_bf = np.where(dsb != 0, d0b / np.where(dsb == 0, 1, dsb), np.inf)
        t_rel = np.abs(t_bf - t_true) / np.maximum(np.abs(t_true), 1e-30)

        eps = 2.0 ** -8
        out[kind] = {
            "n_interior_hits": int(keep.sum()),
            # condition number of dsum: error ~ eps*kappa relative to
            # the decision value. Margins must be >= eps*kappa to be
            # conservative; kappa >= 1/eps = 256 means margin > |value|
            "kappa_dsum_median": float(np.median(kappa[keep])),
            "kappa_dsum_p90": float(np.percentile(kappa[keep], 90)),
            "frac_kappa_beyond_bf16": float(
                (kappa[keep] > 1.0 / eps).mean()),
            # direct bf16 emulation on TRUE interior hits
            "bf16_missed_hit_frac": float(
                (~bf_hit[keep]).mean()),
            "bf16_t_rel_err_median": float(np.median(t_rel[keep])),
            "bf16_t_rel_err_p90": float(np.percentile(t_rel[keep], 90)),
        }
        print(json.dumps({kind: out[kind]}), flush=True)

    # the verdict the numbers support
    print(json.dumps({"conclusion": {
        "sound_margins_must_cover": "eps*kappa of the decision scale",
        "bf16_eps": 2.0 ** -8,
    }}), flush=True)


if __name__ == "__main__":
    main()
