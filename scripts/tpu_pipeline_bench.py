"""End-to-end 4-stage pipeline on the chip: the reference's primary
entry point (reference: fava/__main__.py:228-279 — stages 1..4 over a
plt series), run for real on TPU and recorded as PIPELINE_512.json.

Builds a synthetic rtflame-style AMR plt catalog (a flame front moving
at constant speed with a turbulent brush riding it, region-refined to
a uniform fine band around the front — the refined band tracks the
front across snapshots exactly like a production AMR run regrids), then
drives ``python -m fava_tpu`` three ways:

* phase "cold":       full stages 1->4, empty output dir.
* phase "resumed":    immediate re-run — every artifact exists, so all
                      stages must skip (measures resume overhead).
* phase "interrupt":  fresh output dir, SIGINT mid-stage-4, then a
                      resume run to completion (checkpoint correctness
                      under interruption, the FAVAInterruptHandler
                      contract).

Per-stage walls come from timestamping the pipeline's own stage prints.
Geometry: domain [0,4]x[0,1]^2, 32^3 cells/block, roots 0.5 wide, the
flame band refined to level 4 -> dx 1/512, so the extracted moving
window is exactly 512^3 (matching the cached stage-4 compile shapes).

Usage:
  python scripts/tpu_pipeline_bench.py            # full 512 run
  PIPE_N=128 python scripts/tpu_pipeline_bench.py # small smoke (CPU ok)
  PIPE_PHASES=cold,resumed,interrupt              # subset of phases
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
RUN_DIR = Path(os.environ.get("PIPE_DIR", REPO / "pipeline_run"))
N = int(os.environ.get("PIPE_N", "512"))
TIMES = [0.0, 0.25, 0.5]
X_F0, SPEED = 0.9, 0.4  # flame front: x_f(t) = X_F0 + SPEED * t
HALF_WIDTH = 0.5  # window width 2*half_width = 1.0 -> N cells at dx 1/N


def x_front(t: float) -> float:
    return X_F0 + SPEED * t


def field_fns(t: float):
    """Analytic snapshot at time t: sigmoid flame at x_f(t), turbulent
    brush amplitude A(x) peaked on the front (so the Reynolds-stress
    transverse profile the stage-1 window fit consumes is a smooth
    bump riding the flame)."""
    from scipy.special import expit

    xf = x_front(t)

    def flam(x, y, z):
        return expit(-(x - xf) / 0.02)

    def amp(x):
        return 0.2 + np.exp(-(((x - xf) / 0.15) ** 2))

    def dens(x, y, z):
        return 1.0 + 0.5 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) + 0.6 * flam(x, y, z)

    def temp(x, y, z):
        return 1.0 + 2.0 * flam(x, y, z)

    def velx(x, y, z):
        return amp(x) * 0.5 * np.sin(2 * np.pi * y) * np.cos(2 * np.pi * z)

    def vely(x, y, z):
        return amp(x) * np.sin(2 * np.pi * z + 0.5 * np.cos(2 * np.pi * x))

    def velz(x, y, z):
        return amp(x) * np.cos(2 * np.pi * y + 0.3 * np.sin(2 * np.pi * x))

    return {"flam": flam, "dens": dens, "temp": temp, "velx": velx, "vely": vely, "velz": velz}


def make_catalog(data_dir: Path) -> dict:
    """Write the plt series; returns generation stats."""
    from fava_tpu.io import synthetic

    # Root blocks 0.5 wide with 32^3 cells -> dx_L1 = 1/64; level L
    # halves per step, so dx = 1/N needs L = log2(N/64) + 1.
    level = int(np.log2(N / 64)) + 1
    domain = np.array([[0.0, 4.0], [0.0, 1.0], [0.0, 1.0]])
    data_dir.mkdir(parents=True, exist_ok=True)
    stats = {"files": [], "level": level}
    for i, t in enumerate(TIMES, start=1):
        xf = x_front(t)

        def refine_fn(bounds, lvl, xf=xf):
            # Refine the band the window will need: the front +- the
            # window half extent (the fit centroid lands on the front).
            return level if bounds[0, 1] > xf - 0.5 and bounds[0, 0] < xf + 0.5 else 1

        path = data_dir / f"rt_hdf5_plt_cnt_{i:04d}"
        t0 = time.perf_counter()
        synthetic.make_amr_file(
            path,
            ncells=(32, 32, 32),
            nblks=(8, 2, 2),
            domain=domain,
            refine_fn=refine_fn,
            fields=("flam", "dens", "temp", "velx", "vely", "velz"),
            field_fns=field_fns(t),
            time=t,
        )
        stats["files"].append(
            {
                "name": path.name,
                "gen_s": round(time.perf_counter() - t0, 2),
                "bytes": path.stat().st_size,
            }
        )
        print(f"[gen] {path.name}: {stats['files'][-1]}", flush=True)
    return stats


def write_settings(workdir: Path, data_dir: Path, out_dir: Path) -> None:
    settings = {
        "data folder": str(data_dir),
        "output folder": str(out_dir),
        "basename": "rt_hdf5_plt_cnt",
        "dimension": 3,
        "model": "synthetic rtflame",
        "reynolds stress": {"skip": False},
        "extract windows": {"skip": False},
        "flame window": {"half width": HALF_WIDTH, "transverse": [0.0, 1.0]},
        "fractal dimension": {"skip": False, "settings": {"field": "flam", "contours": 0.5}},
        "kinetic energy spectra": {"skip": False},
        "structure functions": {
            "skip": False,
            # The STAGE4_512 shape (100 seps x 10000 points) so the
            # persistent compile cache from the stage-4 bench hits.
            "settings": {"num_seps": 100, "num_points": 10000, "sep_bounds": [0.01, 0.45]},
        },
    }
    (workdir / "pipeline_settings.json").write_text(json.dumps(settings, indent=2))


def run_pipeline(workdir: Path, label: str, interrupt_after_stage4_prints: int = 0) -> dict:
    """Run ``python -m fava_tpu`` in workdir, timestamping every stdout
    line; optionally SIGINT after the k-th '[stage 4]' print.

    The InterruptHandler contract is Ctrl-C twice: the FIRST SIGINT
    writes the checkpoint and restores the default handlers (the run
    continues); the SECOND actually kills the process. Both are sent."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # Share the repo's warm persistent XLA cache across all phases (and
    # with the stage-4/series bench programs already compiled into it).
    env.setdefault("FAVA_TPU_CACHE_DIR", str(REPO / ".jax_cache"))
    if os.environ.get("PIPE_CPU") == "1":
        # The axon plugin ignores JAX_PLATFORMS env (CLAUDE.md); force
        # the platform via jax.config inside the child, like conftest.
        cmd = [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; runpy.run_module('fava_tpu', run_name='__main__')",
        ]
    else:
        cmd = [sys.executable, "-m", "fava_tpu"]
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        cmd,
        cwd=workdir,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    lines = []
    stage4_seen = 0
    sent_int = False
    for line in proc.stdout:
        ts = time.perf_counter() - t0
        lines.append((ts, line.rstrip("\n")))
        print(f"[{label} {ts:8.1f}s] {line}", end="", flush=True)
        if "[stage 4]" in line:
            stage4_seen += 1
            if interrupt_after_stage4_prints and stage4_seen >= interrupt_after_stage4_prints and not sent_int:
                print(f"[{label}] sending SIGINT mid-stage-4", flush=True)
                proc.send_signal(signal.SIGINT)
                sent_int = True
        if sent_int and "Caught" in line:
            # checkpoint written + default handlers restored; the
            # second SIGINT now kills the run like a real double Ctrl-C
            time.sleep(0.5)
            proc.send_signal(signal.SIGINT)
    rc = proc.wait()
    wall = time.perf_counter() - t0

    # Stage walls from the first timestamp of each stage's prints.
    firsts = {}
    for ts, line in lines:
        for k in (1, 3, 4):
            tag = f"[stage {k}]"
            if tag in line and k not in firsts:
                firsts[k] = ts
    stage_walls = {}
    marks = sorted(firsts.items())
    for idx, (k, ts) in enumerate(marks):
        end = marks[idx + 1][1] if idx + 1 < len(marks) else wall
        stage_walls[f"stage{k}_s"] = round(end - ts, 2)
    return {
        "label": label,
        "returncode": rc,
        "wall_s": round(wall, 2),
        "stage_first_print_s": {k: round(v, 2) for k, v in firsts.items()},
        "stage_walls_s": stage_walls,
        "n_lines": len(lines),
        "interrupted": sent_int,
    }


def count_outputs(out_dir: Path) -> dict:
    return {
        "anl": len(list(out_dir.glob("*hdf5_analysis_*"))),
        "uniform": len(list(out_dir.glob("*hdf5_uniform_*"))),
        "uniform_bytes": sum(p.stat().st_size for p in out_dir.glob("*hdf5_uniform_*")),
    }


def main() -> None:
    phases = os.environ.get("PIPE_PHASES", "cold,resumed,interrupt").split(",")
    RUN_DIR.mkdir(parents=True, exist_ok=True)
    data_dir = RUN_DIR / "data"
    report = {
        "n": N,
        "snapshots": len(TIMES),
        "catalog": None,
        "phases": [],
    }
    import jax

    if os.environ.get("PIPE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    report["platform"] = jax.devices()[0].platform

    # Key catalog reuse on N: a stale catalog at another resolution
    # would silently bench the wrong problem under the new N's label.
    marker = data_dir / ".catalog_n"
    if (data_dir / "rt_hdf5_plt_cnt_0001").is_file() and marker.is_file() and marker.read_text().strip() == str(N):
        print("[gen] catalog exists; reusing", flush=True)
    else:
        if data_dir.exists():
            shutil.rmtree(data_dir)
        report["catalog"] = make_catalog(data_dir)
        marker.write_text(str(N))

    if "cold" in phases or "resumed" in phases:
        work = RUN_DIR / "run_main"
        out = work / "out"
        if "cold" in phases and work.exists():
            shutil.rmtree(work)
        work.mkdir(parents=True, exist_ok=True)
        out.mkdir(exist_ok=True)
        write_settings(work, data_dir, out)
        if "cold" in phases:
            res = run_pipeline(work, "cold")
            res["outputs"] = count_outputs(out)
            report["phases"].append(res)
        if "resumed" in phases:
            res = run_pipeline(work, "resumed")
            res["outputs"] = count_outputs(out)
            report["phases"].append(res)

    if "interrupt" in phases:
        work = RUN_DIR / "run_interrupt"
        if work.exists():
            shutil.rmtree(work)
        out = work / "out"
        work.mkdir(parents=True)
        out.mkdir()
        write_settings(work, data_dir, out)
        # Interrupt at the SECOND stage-4 print (mid-snapshot-2), then
        # resume: stages 1+3 and uniform snapshot 1 must all skip.
        res = run_pipeline(work, "interrupt", interrupt_after_stage4_prints=2)
        ck = json.loads((work / "fava.checkpoint").read_text())
        res["checkpoint_after_interrupt"] = {
            "stage4_index": ck.get("analyze uniform data", {}).get("index"),
            "stage4_analysis_cursor": ck.get("analyze uniform data", {}).get("analysis"),
        }
        report["phases"].append(res)
        res2 = run_pipeline(work, "resume-after-interrupt")
        res2["outputs"] = count_outputs(out)
        report["phases"].append(res2)

    out_path = REPO / (f"PIPELINE_{N}.json")
    out_path.write_text(json.dumps(report, indent=2))
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
