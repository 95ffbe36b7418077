"""Profile SED2012 ingest: where does the native path's time go?

Synthesizes a corpus-shaped XML (~170k records, realistic field sizes),
then times (a) the raw C scan + blob decode (native.parse_sed2012),
(b) the full parse_metadata native path (adds the DataFrame build),
(c) the Python iterparse path on a 20k prefix (scaled estimate), and
(d) convert_timestamp_column on the loaded frame.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("N_RECORDS", 170_000))
PATH = "/tmp/mused_ingest_bench.xml"

WORDS = ("plaza fiesta goal stadium madrid protest camera street night "
         "day crowd music concert rain sun festival sample photo test").split()


def synth_corpus(path, n):
    rng = np.random.default_rng(0)
    with open(path, "w", encoding="utf-8") as f:
        f.write("<photos>\n")
        for i in range(n):
            ws = rng.integers(0, len(WORDS), 12)
            title = " ".join(WORDS[w] for w in ws[:4]).title()
            desc = " ".join(WORDS[w] for w in ws) + " &amp; more!"
            tags = "".join(f"<tag>{WORDS[w]}</tag>" for w in ws[:5])
            lat = -90 + 180 * rng.random()
            lon = -180 + 360 * rng.random()
            f.write(
                f'  <photo id="{1000000 + i}" dateTaken="2012-05-0'
                f'{1 + i % 9} 10:{i % 60:02d}:00.0" dateUploaded="2012-05-0'
                f'{1 + i % 9} 11:{i % 60:02d}:00.0" username="user{i % 997}">\n'
                f'    <location latitude="{lat:.6f}" longitude="{lon:.6f}"/>\n'
                f'    <title>{title}</title>\n'
                f'    <description>{desc}</description>\n'
                f'    <tags>{tags}</tags>\n'
                f'  </photo>\n')
        f.write("</photos>\n")


def main():
    if not os.path.exists(PATH) or os.environ.get("REGEN"):
        t0 = time.perf_counter()
        synth_corpus(PATH, N)
        print(f"synth {N} records -> {os.path.getsize(PATH)/1e6:.0f} MB "
              f"in {time.perf_counter()-t0:.1f}s")

    from mused_tpu import native
    from mused_tpu.data import sed2012

    if native.parse_sed2012(PATH, max_records=1, clean=True) is None:
        sys.exit("native parser unavailable — make -C mused_tpu/native")

    # (a) raw C scan + blob decode
    for _ in range(2):
        t0 = time.perf_counter()
        cols = native.parse_sed2012(PATH, clean=True)
        t_scan = time.perf_counter() - t0
    print(f"a) native.parse_sed2012 (C scan + blob decode): {t_scan:.2f}s "
          f"({cols['n']} records)")

    # (b) full native parse_metadata (DataFrame build on top)
    t0 = time.perf_counter()
    df = sed2012.parse_metadata(PATH, {}, use_native=True)
    t_native = time.perf_counter() - t0
    print(f"b) parse_metadata native: {t_native:.2f}s "
          f"(frame build ~{t_native - t_scan:.2f}s)")

    # (d) timestamp conversion (part of load_sed2012_dataset, not (b))
    t0 = time.perf_counter()
    sed2012.convert_timestamp_column(df["datetaken"].tolist())
    t_ts = time.perf_counter() - t0
    print(f"d) convert_timestamp_column (one col): {t_ts:.2f}s")

    # (c) iterparse estimate from a 20k prefix
    t0 = time.perf_counter()
    sed2012.parse_metadata(PATH, {}, max_records=20_000, use_native=False)
    t_py = (time.perf_counter() - t0) * (N / 20_000)
    print(f"c) iterparse (scaled from 20k): ~{t_py:.2f}s")


if __name__ == "__main__":
    main()
