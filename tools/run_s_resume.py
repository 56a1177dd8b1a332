"""Resume run S (128M-event scaling run) against the surviving pre-generated
input in /dev/shm/cdc_s_work — the 17 GB generation step already ran once and
tmpfs preserved it across the session restart, so this skips gen_input and
goes straight to ceiling + interleaved legs.

Writes the per-leg JSON stream to stdout; the final line is the same result
JSON scaling_bench.main() would print, plus the markdown section is left to
the operator (run S is an APPEND to BENCH/BASELINE.md, not a rewrite, so the
historical runs A-R stay intact).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_bench import cpu_ceiling, make_zip, run_all  # noqa: E402

WORKDIR = "/dev/shm/cdc_s_work"
N_EVENTS = 128_000_000


def main() -> None:
    assert os.path.isdir(os.path.join(WORKDIR, "events")), "input missing"
    os.environ.setdefault("SCALING_DRIVER_MEM", "24g")
    ceil = cpu_ceiling()
    print("CEILING " + json.dumps(ceil), flush=True)
    zpath = make_zip(WORKDIR)  # rebuild: repo code may be newer than the old zip
    runs = run_all((2, 8, 32), WORKDIR, zpath, repeats=2)
    tput = {c: runs[c]["events_per_sec"] for c in runs}
    eff_2_8 = tput[8] / (4 * tput[2])
    eff_8_32 = tput[32] / (4 * tput[8])
    ceil_2_8 = ceil[2] / (4 * ceil[8])
    ceil_8_32 = ceil[8] / (4 * ceil[32])
    result = {
        "run": "S",
        "n_events": N_EVENTS,
        "write_mode": os.environ.get("SCALING_WRITE_MODE", "cow"),
        "driver_mem": os.environ["SCALING_DRIVER_MEM"],
        "throughput": tput,
        "wall": {c: runs[c]["wall_sec"] for c in runs},
        "eff_2_to_8": round(eff_2_8, 3),
        "eff_8_to_32": round(eff_8_32, 3),
        "cpu_ceiling_2_to_8": round(ceil_2_8, 3),
        "cpu_ceiling_8_to_32": round(ceil_8_32, 3),
        "relative_eff_2_to_8": round(eff_2_8 / ceil_2_8, 3),
        "final_rows_equal": len({runs[c]["final_rows"] for c in runs}) == 1,
        "final_rows": runs[2]["final_rows"],
        "loadavg_before_best_leg": {c: runs[c].get("loadavg_before") for c in runs},
    }
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
