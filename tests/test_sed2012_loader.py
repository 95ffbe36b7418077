"""SED2012 ingest on a synthetic XML fixture (the real corpus isn't mounted;
this pins the parsing semantics of reference data_loader.py:9-188)."""
import os
import textwrap

import numpy as np
import pandas as pd
import pytest

from mused_tpu.data import sed2012

XML = """<?xml version="1.0" encoding="UTF-8"?>
<photos>
  <photo id="1000000001" dateTaken="2012-05-01 10:00:00.0" dateUploaded="2012-05-01 11:00:00.0" username=" alice ">
    <location latitude="41.39" longitude="2.17"/>
    <title>Camp de Nou match!</title>
    <description>&lt;b&gt;Great&lt;/b&gt; goal...</description>
    <tags><tag>Soccer</tag><tag>Barcelona!</tag></tags>
  </photo>
  <photo id="1000000002" dateTaken="0000-00-00 00:00:00" dateUploaded="2012-05-02 09:30:00.0" username="bob">
    <title>protest</title>
  </photo>
  <photo id="1000000003" dateTaken="2012-05-03 08:00:00.0" dateUploaded="2012-05-03 08:10:00.0" username="carol">
    <location latitude="bogus" longitude="2.0"/>
    <tags><tag>indignados</tag></tags>
  </photo>
</photos>
"""


@pytest.fixture
def dataset_dir(tmp_path):
    d = tmp_path / "sed2012"
    d.mkdir()
    (d / "sed2012_metadata.xml").write_text(XML)
    # ground truth: photo 1 is a technical event (class 1); photo 3 is an
    # indignados event; photo 2 is noise
    (d / "technical_events.txt").write_text("1000000001\n")
    (d / "soccer_events.txt").write_text("9999999999\n")
    (d / "indignados_events.txt").write_text("1000000003,8888888888\n")
    return str(d)


def test_load_sed2012_dataset(dataset_dir):
    df = sed2012.load_sed2012_dataset(dataset_dir)
    assert len(df) == 3
    row1 = df[df["id"] == 1000000001].iloc[0]
    # label derivation (ref data_loader.py:35-45)
    assert row1["is_event"] == 1 and row1["event_type"] == 1
    assert row1["event_id"] == 1
    row2 = df[df["id"] == 1000000002].iloc[0]
    assert row2["is_event"] == 0 and row2["event_type"] == 0
    row3 = df[df["id"] == 1000000003].iloc[0]
    assert row3["is_event"] == 1 and row3["event_type"] == 3

    # text cleaning (ref :180-185): html stripped, punctuation removed, lower
    assert row1["title"] == "camp de nou match"
    assert row1["description"] == "great goal"
    assert row1["tags"] == ["soccer", "barcelona"]
    assert row1["username"] == "alice"

    # invalid location -> NaN (ref :144-149)
    assert np.isnan(row2["latitude"]) and np.isnan(row3["latitude"])
    assert row1["latitude"] == pytest.approx(41.39)

    # sentinel timestamp -> epoch conversion (ref :47-48)
    assert row2["datetaken"] == sed2012.convert_to_timestamp(
        "1970-01-01 00:00:00")
    assert row1["dateupload"] > row1["datetaken"] > 0


def test_prepare_modalities_on_fixture(dataset_dir):
    df = sed2012.load_sed2012_dataset(dataset_dir)
    mods, types, labels = sed2012.prepare_modalities(
        df, subset_size=3, sort_by_uploaded=True, binary=True,
        noise_rate=1/3, seed=0)
    assert types == ["location", "time", "username", "tags", "text"]
    assert all(m.shape[0] == 3 for m in mods)
    assert set(labels) <= {0, 1}
    # sorted by upload time
    assert list(mods[1][:, 1]) == sorted(mods[1][:, 1])


def test_prepare_modalities_sampling_determinism():
    """Same seed -> identical subsample (the reference's RNG discipline,
    data_loader.py:62-78)."""
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    df = synthetic_events_dataframe(n_rows=300, n_events=3, noise_rate=0.5,
                                    seed=0)
    a = sed2012.prepare_modalities(df, subset_size=100, noise_rate=0.5, seed=7)
    b = sed2012.prepare_modalities(df, subset_size=100, noise_rate=0.5, seed=7)
    c = sed2012.prepare_modalities(df, subset_size=100, noise_rate=0.5, seed=8)
    np.testing.assert_array_equal(a[2], b[2])
    assert not np.array_equal(a[2], c[2]) or not np.array_equal(
        a[0][0], c[0][0])


def test_max_records_and_skip_records(dataset_dir):
    """Bounded + resumable iterparse (VERDICT r1 missing #4 readiness): the
    prefix parse equals the head of the full parse, and skip+parse chunks
    concatenate to the full parse."""
    full = sed2012.load_sed2012_dataset(dataset_dir)
    head = sed2012.load_sed2012_dataset(dataset_dir, max_records=3)
    assert len(head) == 3
    pd.testing.assert_frame_equal(head, full.iloc[:3].reset_index(drop=True),
                                  check_index_type=False)
    tail = sed2012.load_sed2012_dataset(dataset_dir, skip_records=3)
    assert len(tail) == len(full) - 3
    assert list(tail["id"]) == list(full["id"].iloc[3:])


# ---------------------------------------------------------------------------
# native C++ scanner (mused_tpu/native/sed2012_parser.cpp)
# ---------------------------------------------------------------------------

GNARLY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<photos>
  <photo id="42" dateTaken="2012-01-01 00:00:00.0"
         dateUploaded='2012-01-02 00:00:00.0' username="&quot;ana&quot;">
    <location latitude="-3.5e1" longitude="  2.0  "/>
    <title><![CDATA[raw <b>cdata</b> & stuff]]> plus &#x41;&#66; text</title>
    <description>line one
line two &amp;&amp;</description>
    <tags><tag> spaced </tag><tag></tag><tag>caf&#233;</tag></tags>
  </photo>
  <photo id="43" dateTaken="" dateUploaded="" username=""/>
  <photo id="44" dateTaken="2012-02-02 02:02:02.0" dateUploaded="2012-02-02 03:02:02.0" username="bob">
    <location latitude="1.0" longitude="junk"/>
    <description></description>
  </photo>
</photos>
"""


def _parity_frames(xml, tmp_path, **kw):
    from mused_tpu import native
    if not native._load_sed():
        pytest.skip("native toolchain unavailable")
    p = tmp_path / "m.xml"
    p.write_text(xml)
    gt = {"42": 7}
    py = sed2012.parse_metadata(str(p), gt, use_native=False, **kw)
    nat = sed2012.parse_metadata(str(p), gt, use_native=True, **kw)
    pd.testing.assert_frame_equal(nat, py)
    return nat


def test_native_parser_matches_python_on_fixture(tmp_path):
    df = _parity_frames(XML, tmp_path)
    assert len(df) == 3


def test_native_parser_entities_cdata_missing_fields(tmp_path):
    """CDATA segments, named/decimal/hex entities, quote styles, multi-line
    text, self-closed photos, unparseable floats — the native scanner must
    reproduce ElementTree + the loader's cleanup byte-for-byte."""
    df = _parity_frames(GNARLY_XML, tmp_path)
    assert len(df) == 3
    row = df[df["id"] == 42].iloc[0]
    assert "cdata" in row["title"] and "ab text" in row["title"]
    assert row["tags"] == ["spaced", "caf"]      # clean_text strips accents
    assert row["event_id"] == 7
    # joint lat/lon try semantics (ref :144-149): bad longitude voids both
    row44 = df[df["id"] == 44].iloc[0]
    assert np.isnan(row44["latitude"]) and np.isnan(row44["longitude"])


def test_native_parser_bounded_and_skip(tmp_path):
    df_b = _parity_frames(XML, tmp_path, max_records=2)
    assert list(df_b["id"]) == [1000000001, 1000000002]
    df_s = _parity_frames(XML, tmp_path, skip_records=1)
    assert list(df_s["id"]) == [1000000002, 1000000003]


def test_native_parser_env_optout(tmp_path, monkeypatch):
    monkeypatch.setenv("MUSED_TPU_NO_NATIVE_PARSER", "1")
    p = tmp_path / "m.xml"
    p.write_text(XML)
    df = sed2012.parse_metadata(str(p), {})    # must take the Python path
    assert len(df) == 3


EVIL_XML = """<?xml version="1.0" encoding="UTF-8"?>
<photos>
  <photo id="1" dateTaken="2012-01-01 00:00:00.0" dateUploaded="2012-01-01 01:00:00.0" username="a&gt;b&quot;c">
    <location latitude="1.5" longitude="2.5"/>
    <title>ok title</title>
    <description><![CDATA[Tom &amp; Jerry say <tag>not a tag</tag> and </photo> fake]]></description>
    <tags><tag>real1</tag></tags>
  </photo>
  <photo id="2" dateTaken="2012-01-02 00:00:00.0" dateUploaded="2012-01-02 01:00:00.0" username="plain"/>
  <photo id="3" dateTaken="2012-01-03 00:00:00.0" dateUploaded="2012-01-03 01:00:00.0" username="q&apos;uote">
    <title><![CDATA[x &lt; y]]> tail</title>
    <tags><tag>real3</tag></tags>
  </photo>
</photos>
"""


def test_native_parser_hostile_markup(tmp_path):
    """Regression (review findings): entity references inside CDATA stay
    LITERAL ('&amp;' must survive as text, not decode); markup-looking
    strings inside CDATA ('<tag>', '</photo>') must not terminate or spawn
    elements; '>' and quotes inside attribute values must not truncate the
    start tag; self-closed photos parse."""
    df = _parity_frames(EVIL_XML, tmp_path)
    assert len(df) == 3
    r1 = df[df["id"] == 1].iloc[0]
    assert r1["username"] == 'a>b"c'
    assert "amp" in r1["description"]            # literal &amp; -> 'amp' token
    assert r1["tags"] == ["real1"]               # CDATA <tag> is not a tag
    assert df[df["id"] == 3].iloc[0]["tags"] == ["real3"]


def test_native_clean_text_fuzz_parity(tmp_path):
    """Fuzz the in-C++ clean_text reimplementation against the Python
    reference through a full XML round trip: random text (unicode, HTML-ish
    spans, newlines, entities via proper escaping) must clean identically on
    both loader paths."""
    import random
    from xml.sax.saxutils import escape

    rng = random.Random(0)
    alphabet = (list("abcXYZ019 <>&\"'\t\n\r.,!?-_/") +
                ["é", "ß", "中", "\xa0", " ", "<b>", "</b>", "&amp;",
                 "tag>", "<", ">"])
    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n<photos>\n']
    for i in range(150):
        txt = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        tag_txt = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        parts.append(
            f'<photo id="{i}" dateTaken="2012-01-01 00:00:00.0" '
            f'dateUploaded="2012-01-01 01:00:00.0" username="u{i}">'
            f'<title>{escape(txt)}</title>'
            f'<description>{escape(txt[::-1])}</description>'
            f'<tags><tag>{escape(tag_txt)}</tag></tags></photo>\n')
    parts.append('</photos>\n')
    df = _parity_frames("".join(parts), tmp_path)
    assert len(df) == 150


def test_native_parser_threaded_byte_identical(tmp_path):
    """The chunk-parallel scan (sed2012_parser.cpp scan_range + stitch) must
    be byte-identical to threads=1 — including when chunk cuts land on
    '<photo' text inside another record's CDATA (the stitch-conflict
    reparse) and when records straddle chunk boundaries."""
    from mused_tpu import native
    if not native._load_sed():
        pytest.skip("native toolchain unavailable")
    import random
    rng = random.Random(1)
    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n<photos>\n']
    for i in range(400):
        # every few records, a CDATA description containing phantom markup
        # ('<photo id="evil">', '</photo>') that a naive chunk cut would
        # misparse; vary record sizes so cuts land everywhere
        evil = ('<![CDATA[look <photo id="evil" dateTaken="x"> fake '
                'and </photo> done]]>' if i % 3 == 0 else
                "plain text " * rng.randint(0, 8))
        parts.append(
            f'<photo id="{i}" dateTaken="2012-01-01 00:00:0{i % 10}.0" '
            f'dateUploaded="2012-01-01 01:00:00.0" username="u{i % 7}">'
            f'<location latitude="{i % 90}.5" longitude="-{i % 180}.25"/>'
            f'<title>t {i} {"pad " * rng.randint(0, 6)}</title>'
            f'<description>{evil}</description>'
            f'<tags><tag>a{i}</tag><tag>b{i % 5}</tag></tags></photo>\n')
    parts.append('</photos>\n')
    p = tmp_path / "mt.xml"
    p.write_text("".join(parts))
    seq = native.parse_sed2012(str(p), clean=True, threads=1)
    for t in (2, 3, 5, 13):
        par = native.parse_sed2012(str(p), clean=True, threads=t)
        assert par["n"] == seq["n"] == 400
        for k in seq:
            if isinstance(seq[k], list):
                assert par[k] == seq[k], (t, k)
            else:
                np.testing.assert_array_equal(par[k], seq[k], err_msg=f"{t} {k}")


def test_native_parser_arrow_strings_roundtrip(tmp_path):
    """arrow_strings=True returns title/description as pyarrow arrays whose
    values equal the list path's decode+split, and parse_metadata builds an
    identical DataFrame either way (it uses arrow_strings internally)."""
    from mused_tpu import native
    if not native._load_sed():
        pytest.skip("native toolchain unavailable")
    pa = pytest.importorskip("pyarrow")
    p = tmp_path / "m.xml"
    p.write_text(GNARLY_XML)
    lists = native.parse_sed2012(str(p), clean=True)
    arrow = native.parse_sed2012(str(p), clean=True, arrow_strings=True)
    assert isinstance(arrow["title"], pa.Array)
    assert arrow["title"].to_pylist() == lists["title"]
    assert arrow["description"].to_pylist() == lists["description"]
    # the helper's framing/UTF-8 guards: malformed inputs fall back to None
    assert native._arrow_strings_from_blob(b"a\x00b", 3) is None  # count
    assert native._arrow_strings_from_blob(b"\xff\xfe", 1) is None  # utf-8
    assert native._arrow_strings_from_blob(b"", 0).to_pylist() == []
    assert native._arrow_strings_from_blob(b"", 1).to_pylist() == [""]


def test_timestamp_column_vectorization_parity():
    """convert_timestamp_column == per-row convert_to_timestamp (reference
    data_loader.py:187-188 semantics: local-time mktime, fractional seconds
    dropped), including the sentinel-replaced epoch and both formats."""
    from mused_tpu.data.sed2012 import (convert_timestamp_column,
                                        convert_to_timestamp)
    vals = (["2012-0%d-1%d 0%d:2%d:3%d.%d" % (i % 8 + 1, i % 3, i % 9,
                                              i % 9, i % 9, i % 10)
             for i in range(500)] +
            ["2012-12-31 23:59:59", "1970-01-01 00:00:00",
             "2000-02-29 12:00:00.5", "1999-01-01 00:00:00.999999"])
    want = np.array([convert_to_timestamp(v) for v in vals])
    np.testing.assert_array_equal(convert_timestamp_column(vals), want)
    with pytest.raises(ValueError, match="unparseable"):
        convert_timestamp_column(["2012-01-01 00:00:00", "garbage"])


def test_native_parser_comments_and_embedded_attr_patterns(tmp_path):
    """Round-5 parser hardening: XML comments are invisible markup
    (ElementTree discards them — a '<photo' inside a comment must not
    fabricate a record, and a comment inside <title> merges the
    surrounding text), and attribute lookup is quote-aware (an ` id='9' `
    pattern INSIDE another attribute's value must not shadow the real
    id)."""
    xml = """<photos>
  <!-- preamble <photo id="666" dateTaken="x"> not a record -->
  <photo username="see id='9' here" id="1000000001" dateTaken="2012-01-01 01:01:01.0" dateUploaded="2012-01-01 02:01:01.0">
    <title>foo <!-- gone --> bar</title>
    <tags><tag>alpha</tag><!-- <tag>ghost</tag> --><tag>beta</tag></tags>
  </photo>
  <photo id="1000000002" dateTaken="2012-01-02 01:01:01.0" dateUploaded="2012-01-02 02:01:01.0" username="bob"/>
</photos>
"""
    df = _parity_frames(xml, tmp_path)
    assert len(df) == 2
    assert df["id"].tolist() == [1000000001, 1000000002]
    assert df["username"].iloc[0] == "see id='9' here"
    assert df["tags"].iloc[0] == ["alpha", "beta"]


def test_native_parser_locale_proof_floats(tmp_path):
    """from_chars float parse: hex floats are junk (Python float() raises
    -> NaN on both paths), plain decimals parse identically."""
    xml = """<photos>
  <photo id="1" dateTaken="2012-01-01 01:01:01.0" dateUploaded="2012-01-01 02:01:01.0" username="a">
    <location latitude="0x10" longitude="0x10"/>
  </photo>
  <photo id="2" dateTaken="2012-01-01 01:01:01.0" dateUploaded="2012-01-01 02:01:01.0" username="b">
    <location latitude="2.25" longitude="41.39"/>
  </photo>
</photos>
"""
    df = _parity_frames(xml, tmp_path)
    assert np.isnan(df["latitude"].iloc[0])
    assert df["longitude"].iloc[1] == pytest.approx(41.39)


def test_timestamp_vectorized_guard_semantics():
    """The vectorized (UTC-host) timestamp path must match the scalar
    semantics: 7-digit fractions raise even on unpadded fields (the old
    26-char guard missed them), and rows outside pandas' datetime64[ns]
    range fall back to the scalar conversion instead of erroring."""
    import time as _t
    if _t.timezone != 0 or _t.daylight:
        pytest.skip("scalar path host")
    ok = sed2012.convert_timestamp_column(
        ["2012-01-01 01:01:01.5", "3000-01-01 00:00:00"])
    assert ok[1] == sed2012.convert_to_timestamp("3000-01-01 00:00:00")
    with pytest.raises(ValueError):
        sed2012.convert_timestamp_column(["2012-1-1 0:0:0.1234567"])
