"""Print a start-ordered event timeline for a few scan iterations from an
xplane trace captured by exp_fold_trace.py, to see the real serialization
inside the composed blocked-FD scan body.

Usage: python experiments/exp_trace_timeline.py /tmp/fold_trace_fold [anchor]
"""
import glob
import sys

from jax.profiler import ProfileData


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fold_trace_fold"
    anchor = sys.argv[2] if len(sys.argv) > 2 else "conditional"
    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    pd = ProfileData.from_file(files[0])
    plane = next(p for p in pd.planes if "TPU" in p.name)
    evs = []
    for line in plane.lines:
        for ev in line.events:
            evs.append((ev.start_ns, ev.duration_ns, line.name, ev.name))
    evs.sort()
    # find the Nth anchor event and print everything between it and the
    # (N+2)th, so we see two full iterations
    idx = [i for i, e in enumerate(evs) if anchor in e[3]]
    if len(idx) < 12:
        print(f"only {len(idx)} anchor events")
        lo, hi = 0, min(len(evs), 400)
        t0 = evs[0][0]
    else:
        a = idx[10]
        t0 = evs[a][0]
        t2 = [e for i, e in enumerate(idx) if evs[e][0] > t0][1]
        lo = a
        hi = next((i for i, e in enumerate(evs)
                   if e[0] >= evs[t2][0] + evs[t2][1]), len(evs))
    budget = 0
    for st, dur, lname, name in evs[lo:hi]:
        budget += 1
        if budget > 250:
            print("... (truncated)")
            break
        print(f"{(st - t0) / 1e6:9.3f} +{dur / 1e6:8.3f} ms  [{lname[:18]:18}] "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
