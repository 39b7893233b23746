"""Particle-family evidence at production tracer counts (VERDICT r4
weak #4): generate a 1e6-tracer synthetic part-file series with
per-snapshot ROW PERMUTATION (FLASH particles migrate between ranks, so
table order is never stable — the tag re-resolution paths are exactly
what scale exercises), run the three Lagrangian analyses, time them,
and pin their numerics against independently-coded f64 oracles:

* lagrangian_autocorrelation — same-draw oracle from the constructed
  velocity tables (v_i(t) = cos(w t + phi_i), tag-keyed phases).
* dispersion_statistics — single-particle MSD against the ballistic
  closed form (x_i(t) = x_i(0) + u_i t  =>  MSD = <|u|^2> t^2, exact),
  pair MSD against a scipy cKDTree nearest-neighbor reimplementation.
* cross_correlation — Naka et al. estimator recomputed directly from
  the constructed tag-indexed tables.

Writes PARTICLES_1M.json (walls + errors) and merges three entries into
VALIDATION.json "analyses". Host-side NumPy by design (documented at
analysis/dispersion.py:31-33) — the point here is evidence at scale,
and a measured host-vs-device verdict for the pair search.

    python scripts/tpu_particles_bench.py [nparticles] [nsnapshots]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from fava_tpu.io import flash_file  # noqa: E402

OMEGA = 2.0 * np.pi
USCALE = 0.1


def build_tables(npart: int, seed: int = 0):
    """Tag-keyed kinematics: phases/velocities are functions of the tag
    so any row permutation is recoverable."""
    rng = np.random.default_rng(seed)
    phases = rng.uniform(0.0, 2.0 * np.pi, size=(npart, 3))
    x0 = rng.uniform(0.0, 1.0, size=(npart, 3))
    u = USCALE * np.cos(phases)  # constant drift per particle
    return phases, x0, u


def snapshot_arrays(phases, x0, u, t):
    pos = x0 + u * t
    vel = np.cos(OMEGA * t + phases)
    return pos, vel


def write_series(data_dir: Path, npart: int, times, phases, x0, u, seed: int = 1):
    data_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    tags = np.arange(1, npart + 1, dtype=np.float64)
    gen_s = 0.0
    for i, t in enumerate(times, start=1):
        t0 = time.perf_counter()
        pos, vel = snapshot_arrays(phases, x0, u, t)
        perm = rng.permutation(npart)  # rank migration: new order per file
        table = {
            "tag": tags[perm],
            "posx": pos[perm, 0],
            "posy": pos[perm, 1],
            "posz": pos[perm, 2],
            "velx": vel[perm, 0],
            "vely": vel[perm, 1],
            "velz": vel[perm, 2],
        }
        flash_file.write_particle_file(
            data_dir / f"rt_hdf5_part_{i:04d}",
            int_scalars={"dimensionality": 3, "globalnumparticles": npart},
            real_scalars={"time": float(t), "dt": 1.0e-3, "dtold": 1.0e-3},
            particles=table,
        )
        gen_s += time.perf_counter() - t0
    return gen_s


def main() -> None:
    import fava_tpu

    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nsnap = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    times = [0.1 * k for k in range(nsnap)]

    data_dir = ROOT / "particles_run"
    if data_dir.exists():
        shutil.rmtree(data_dir)
    phases, x0, u = build_tables(npart)
    gen_s = write_series(data_dir, npart, times, phases, x0, u)
    file_bytes = sum(p.stat().st_size for p in data_dir.iterdir())
    print(f"generated {nsnap} files, {file_bytes/1e6:.0f} MB, {gen_s:.1f} s", flush=True)

    results = {
        "nparticles": npart,
        "nsnapshots": nsnap,
        "file_bytes_total": file_bytes,
        "generation_s": round(gen_s, 2),
    }
    val_entries: dict = {}
    m = fava_tpu.FLASH(data_dir)

    # --- lagrangian autocorrelation -----------------------------------
    print("== lagrangian_autocorrelation ==", flush=True)
    t0 = time.perf_counter()
    got_t, got = m.lagrangian_autocorrelation(nsamples=npart, fields=["velx", "vely"])
    wall_lag = time.perf_counter() - t0
    # same-draw oracle straight from the construction (tag order)
    exp = {f: np.zeros(nsnap) for f in ("velx", "vely")}
    for k, t in enumerate(times):
        _, vel = snapshot_arrays(phases, x0, u, t)
        _, vel0 = snapshot_arrays(phases, x0, u, times[0])
        for j, f in enumerate(("velx", "vely")):
            exp[f][k] = np.sum(vel0[:, j] * vel[:, j]) / (
                np.linalg.norm(vel0[:, j]) * np.linalg.norm(vel[:, j])
            )
    err_lag = max(float(np.abs(got[f] - exp[f]).max()) for f in ("velx", "vely"))
    results["lagrangian_autocorrelation"] = {"wall_s": round(wall_lag, 2), "max_abs_error": err_lag}
    val_entries["lagrangian_autocorrelation"] = {
        "config": {"nparticles": npart, "nsnapshots": nsnap, "fields": ["velx", "vely"],
                   "row_order": "fresh permutation per snapshot (tag re-resolution)"},
        "oracle": "same-draw f64 closed form v_i(t) = cos(w t + phi_i) in tag order",
        "expected_rho_velx": [round(float(v), 6) for v in exp["velx"]],
        "max_abs_error": err_lag,
        "wall_s": round(wall_lag, 2),
    }
    print(f"  wall {wall_lag:.2f} s, err {err_lag:.2e}", flush=True)

    # --- dispersion statistics ----------------------------------------
    print("== dispersion_statistics ==", flush=True)
    npairs = 1024
    t0 = time.perf_counter()
    disp = m.dispersion_statistics(npairs=npairs, seed=0)
    wall_disp = time.perf_counter() - t0
    # single-particle MSD: exact ballistic closed form <|u|^2> t^2
    msd_exp = np.array([(np.sum(u**2, axis=1)).mean() * t**2 for t in times])
    err_single = float(
        np.abs(disp["single_msd"] - msd_exp).max() / max(msd_exp.max(), 1e-30)
    )
    # pair MSD oracle: independent nearest-neighbor search (cKDTree)
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    anchors = rng.choice(npart, size=npairs, replace=False)
    t0k = time.perf_counter()
    tree = cKDTree(x0)
    _, nn = tree.query(x0[anchors], k=2)
    kd_s = time.perf_counter() - t0k
    partners = np.where(nn[:, 0] == anchors, nn[:, 1], nn[:, 0])
    du = u[anchors] - u[partners]
    d0 = x0[anchors] - x0[partners]
    pair_exp = np.array([np.mean(np.sum((d0 + du * t) ** 2, axis=1)) for t in times])
    err_pair = float(np.abs(disp["pair_msd"] - pair_exp).max() / pair_exp.max())
    results["dispersion_statistics"] = {
        "wall_s": round(wall_disp, 2),
        "kdtree_oracle_s": round(kd_s, 3),
        "max_scaled_error_single": err_single,
        "max_scaled_error_pair": err_pair,
    }
    val_entries["dispersion_statistics"] = {
        "config": {"nparticles": npart, "npairs": npairs, "nsnapshots": nsnap},
        "oracle": "ballistic closed form <|u|^2> t^2 (single, exact) + "
        "independent cKDTree nearest-neighbor pair reimplementation",
        "max_scaled_error": {"single_msd": err_single, "pair_msd": err_pair},
        "wall_s": round(wall_disp, 2),
    }
    print(
        f"  wall {wall_disp:.2f} s (kdtree oracle {kd_s:.3f} s), "
        f"err single {err_single:.2e} pair {err_pair:.2e}",
        flush=True,
    )

    # --- cross correlation (Naka et al.) ------------------------------
    print("== cross_correlation ==", flush=True)
    sample_tags = np.arange(2, 130, 2, dtype=np.float64)  # 64 sample tags
    poi_tag = 777.0
    t0 = time.perf_counter()
    rho = m.cross_correlation(
        "velx",
        "vely",
        sample_tags,
        poi_tag,
        lagrangian_tracking=True,
        tag_field="tag",
    )
    wall_cc = time.perf_counter() - t0
    # oracle straight from tag-indexed construction (tags are 1-based)
    svals = np.stack(
        [snapshot_arrays(phases, x0, u, t)[1][(sample_tags - 1).astype(int), 0] for t in times]
    )  # (nfiles, npts) velx
    tvals = np.array(
        [snapshot_arrays(phases, x0, u, t)[1][int(poi_tag) - 1, 1] for t in times]
    )[:, None]  # (nfiles, 1) vely
    smean = svals[:-1].mean(axis=0)
    tmean = tvals[1:].mean()
    sstd = svals[:-1].std(axis=0)
    tstd = tvals[1:].std()
    Rts = np.sum(tvals[1:] * svals[:-1, :], axis=0) / float(nsnap - 1)
    rho_exp = (Rts - smean * tmean) / (sstd * tstd)
    err_cc = float(np.abs(rho - rho_exp).max() / np.abs(rho_exp).max())
    results["cross_correlation"] = {"wall_s": round(wall_cc, 2), "max_scaled_error": err_cc}
    val_entries["cross_correlation"] = {
        "config": {"nparticles": npart, "nsamples": len(sample_tags), "nsnapshots": nsnap},
        "oracle": "Naka et al. estimator recomputed from the tag-indexed f64 construction",
        "max_scaled_error": err_cc,
        "wall_s": round(wall_cc, 2),
    }
    print(f"  wall {wall_cc:.2f} s, err {err_cc:.2e}", flush=True)

    (ROOT / "PARTICLES_1M.json").write_text(json.dumps(results, indent=2))
    val_path = ROOT / "VALIDATION.json"
    if val_path.is_file():
        report = json.loads(val_path.read_text())
        report.setdefault("analyses", {}).update(val_entries)
        val_path.write_text(json.dumps(report, indent=2))
    print("wrote PARTICLES_1M.json + VALIDATION entries", flush=True)
    shutil.rmtree(data_dir)


if __name__ == "__main__":
    main()
