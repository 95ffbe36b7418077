"""Synthetic data: sketch benchmark streams + SED-like multimodal fixtures.

Two generators:

1. ``synthetic_stream`` reproduces the spec of the reference's sketch
   benchmark fixture ``synthetic_n=500000,m=10,d=300,zeta=10.mat`` (reference
   data_loader.py:190-195): n rows in d dims with m dominant directions and
   noise parameter zeta — the standard Frequent-Directions evaluation input
   (signal S D U + noise/zeta from the FD papers).

2. ``synthetic_events_dataframe`` builds a small SED2012-shaped DataFrame
   (same columns/labels as data/sed2012.py) with planted events that cluster
   in time, space, usernames, tags, and text — the end-to-end test fixture
   the reference never had (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def synthetic_stream(n: int = 500_000, m: int = 10, d: int = 300,
                     zeta: int = 10, seed: int = 0) -> np.ndarray:
    """(n, d) float32 stream with m dominant directions (FD benchmark input)."""
    rng = np.random.default_rng(seed)
    # signal: n x m coefficients with linearly decaying scales, times a random
    # orthonormal m x d basis; plus isotropic noise scaled by 1/zeta
    basis, _ = np.linalg.qr(rng.normal(size=(d, m)))
    scales = np.linspace(1.0, 0.1, m)
    coefs = rng.normal(size=(n, m)) * scales[None, :]
    signal = coefs @ basis.T
    noise = rng.normal(size=(n, d)) / zeta
    return (signal + noise).astype(np.float32)


def load_synthetic_dataset(subset_size: int | None = None, d: int = 300,
                           seed: int = 0):
    """Reference load_synthetic_dataset contract (data_loader.py:190-195):
    returns a one-element list with an (n, d) float64 array.  Generated rather
    than read from the submodule's .mat file (which ships with the missing
    swfd submodule)."""
    n = subset_size if subset_size else 500_000
    return [synthetic_stream(n=n, d=d, seed=seed).astype(np.float64)]


def crisis_embedding_stream(n_rows: int = 2048, n_events: int = 8,
                            noise_rate: float = 0.4, d_text: int = 512,
                            d_image: int = 512, seed: int = 0):
    """Two-modality text+image embedding stream (CrisisMMD-style; BASELINE.md
    config #2): each event is a pair of (text, image) embedding centroids;
    noise rows are isotropic.  Returns (modalities, modality_types, labels)
    in the engine's generic-numeric format.
    """
    rng = np.random.default_rng(seed)
    txt_centers = rng.normal(size=(n_events, d_text)).astype(np.float32)
    img_centers = rng.normal(size=(n_events, d_image)).astype(np.float32)
    txt_centers /= np.linalg.norm(txt_centers, axis=1, keepdims=True)
    img_centers /= np.linalg.norm(img_centers, axis=1, keepdims=True)

    labels = np.zeros(n_rows, np.int64)
    text = np.empty((n_rows, d_text), np.float32)
    image = np.empty((n_rows, d_image), np.float32)
    for i in range(n_rows):
        if rng.random() >= noise_rate:
            ev = int(rng.integers(n_events))
            labels[i] = ev + 1
            text[i] = txt_centers[ev] + rng.normal(size=d_text) * 0.15
            image[i] = img_centers[ev] + rng.normal(size=d_image) * 0.15
        else:
            text[i] = rng.normal(size=d_text)
            image[i] = rng.normal(size=d_image)
    text /= np.maximum(np.linalg.norm(text, axis=1, keepdims=True), 1e-9)
    image /= np.maximum(np.linalg.norm(image, axis=1, keepdims=True), 1e-9)
    return [text, image], ["embedding", "embedding"], labels


_WORDS = ("festival concert goal match stadium protest plaza camp strike rally "
          "music crowd street fireworks banner speech square kickoff referee "
          "anthem drums tent march police flags").split()


def synthetic_events_dataframe(n_rows: int = 400, n_events: int = 6,
                               noise_rate: float = 0.4, seed: int = 0,
                               fast: bool | None = None) -> pd.DataFrame:
    """SED2012-shaped DataFrame with planted multimodal events.

    Each event has a home (lat, lon), a time window, a user pool, a tag
    vocabulary, and a text vocabulary; noise rows draw uniformly.  Labels:
    event_id in 1..n_events (0 = noise), is_event, event_type in {0,1,2,3}.

    ``fast`` selects the vectorized generator: same distributions and
    schema, different RNG consumption order (so rows differ from the loop
    path for the same seed).  Auto-on at n_rows >= 20_000, where the
    per-row loop's ~1 ms/row (~16 min per 1M rows) makes the huge-window
    and 1M-stream regimes host-bound; small fixtures keep the loop path so
    seeded test streams stay stable.  The threshold is part of the data
    contract since commit 872169a — callers that must reproduce a recorded
    stream should pass ``fast`` explicitly rather than rely on it.
    """
    if fast is None:
        fast = n_rows >= 20_000
    if fast:
        return _synthetic_events_fast(n_rows, n_events, noise_rate, seed)
    rng = np.random.default_rng(seed)
    n_noise = int(n_rows * noise_rate)
    n_event_rows = n_rows - n_noise
    base_time = 1.3e9

    rows = []
    for i in range(n_rows):
        if i < n_event_rows:
            ev = i % n_events + 1
            erng = np.random.default_rng(1000 + ev)
            home = erng.uniform([-40, -120], [40, 120])
            t0 = base_time + ev * 5e5
            users = [f"user_{ev}_{k}" for k in range(4)]
            tag_vocab = [f"tag{ev}_{k}" for k in range(6)] + ["shared"]
            words = list(rng.choice(_WORDS, 4)) + [f"event{ev}"]
            lat, lon = home + rng.normal(size=2) * 0.05
            taken = t0 + rng.uniform(0, 3600)
            upload = taken + rng.uniform(0, 1800)
            username = users[rng.integers(len(users))]
            tags = list(rng.choice(tag_vocab, size=rng.integers(2, 5), replace=False))
            title = " ".join(rng.choice(words, 3))
            desc = " ".join(rng.choice(words, 5))
            event_id = ev
        else:
            lat, lon = rng.uniform([-60, -170], [60, 170])
            taken = base_time + rng.uniform(0, n_events * 1e6)
            upload = taken + rng.uniform(0, 86400)
            username = f"noise_user_{rng.integers(0, n_noise // 2 + 1)}"
            tags = list(rng.choice([f"ntag{k}" for k in range(50)],
                                   size=rng.integers(0, 3), replace=False))
            title = " ".join(rng.choice(_WORDS, 2))
            desc = " ".join(rng.choice(_WORDS, 3))
            event_id = 0

        # sprinkle reference-like invalidity: some rows lack geo/time/text
        if rng.random() < 0.1:
            lat, lon = np.nan, np.nan
        if rng.random() < 0.05:
            taken = 0.0
        rows.append([i, taken, upload, lat, lon, title, desc, tags, username,
                     event_id])

    df = pd.DataFrame(rows, columns=["id", "datetaken", "dateupload", "latitude",
                                     "longitude", "title", "description", "tags",
                                     "username", "event_id"])
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    eid = df["event_id"].to_numpy()
    df["is_event"] = (eid > 0).astype(int)
    df["event_type"] = np.where(eid == 0, 0, (eid - 1) % 3 + 1)
    return df


def _join_words(words: np.ndarray) -> list[str]:
    """Row-wise ' '.join of a (n, w) object array of words."""
    out = words[:, 0].astype(object)
    for j in range(1, words.shape[1]):
        out = out + " " + words[:, j]
    return out.tolist()


def _synthetic_events_fast(n_rows: int, n_events: int, noise_rate: float,
                           seed: int) -> pd.DataFrame:
    """Vectorized synthetic_events_dataframe: identical schema and
    per-column distributions, ~3 orders of magnitude faster at 1M rows.

    Matches the loop generator's structure: event rows first (event
    homes/time windows/vocabularies are the SAME deterministic per-event
    values — they derive from per-event default_rng(1000+ev) streams),
    then noise rows, then the same df.sample(random_state=seed) shuffle.
    Only the per-row draws consume the global RNG in a different order.
    """
    rng = np.random.default_rng(seed)
    n_noise = int(n_rows * noise_rate)
    ne = n_rows - n_noise
    base_time = 1.3e9
    words_arr = np.array(_WORDS, object)

    # --- event rows -------------------------------------------------------
    ev = (np.arange(ne) % n_events) + 1 if ne else np.zeros(0, np.int64)
    homes = np.stack([np.random.default_rng(1000 + e)
                      .uniform([-40, -120], [40, 120])
                      for e in range(1, n_events + 1)]) \
        if n_events else np.zeros((0, 2))
    latlon = homes[ev - 1] + rng.normal(size=(ne, 2)) * 0.05 \
        if ne else np.zeros((0, 2))
    taken_e = base_time + ev * 5e5 + rng.uniform(0, 3600, ne)
    upload_e = taken_e + rng.uniform(0, 1800, ne)
    user_e = np.array([f"user_{e}_{k}" for e, k in
                       zip(ev, rng.integers(0, 4, ne))], object) \
        if ne else np.zeros(0, object)

    tag_vocab = np.array([[f"tag{e}_{k}" for k in range(6)] + ["shared"]
                          for e in range(1, n_events + 1)], object) \
        if n_events else np.zeros((0, 7), object)
    tag_perm = np.argsort(rng.random((ne, 7)), axis=1)
    tag_sizes = rng.integers(2, 5, ne)
    tag_rows = np.take_along_axis(tag_vocab[ev - 1], tag_perm, axis=1) \
        if ne else np.zeros((0, 7), object)
    tags_e = [list(r[:s]) for r, s in zip(tag_rows, tag_sizes)]

    # per-row 5-word vocab: 4 global words + the event word; title/desc draw
    # from it with replacement (the loop generator's rng.choice default)
    vocab_e = np.concatenate(
        [words_arr[rng.integers(0, len(words_arr), (ne, 4))],
         np.array([f"event{e}" for e in ev], object)[:, None]], axis=1) \
        if ne else np.zeros((0, 5), object)
    title_e = _join_words(np.take_along_axis(
        vocab_e, rng.integers(0, 5, (ne, 3)), axis=1)) if ne else []
    desc_e = _join_words(np.take_along_axis(
        vocab_e, rng.integers(0, 5, (ne, 5)), axis=1)) if ne else []

    # --- noise rows -------------------------------------------------------
    nn = n_noise
    latlon_n = rng.uniform([-60, -170], [60, 170], size=(nn, 2)) \
        if nn else np.zeros((0, 2))
    taken_n = base_time + rng.uniform(0, n_events * 1e6, nn)
    upload_n = taken_n + rng.uniform(0, 86400, nn)
    user_n = np.array([f"noise_user_{u}" for u in
                       rng.integers(0, n_noise // 2 + 1, nn)], object) \
        if nn else np.zeros(0, object)
    ntag_vocab = np.array([f"ntag{k}" for k in range(50)], object)
    nperm = np.argsort(rng.random((nn, 50)), axis=1)[:, :3]
    nsizes = rng.integers(0, 3, nn)
    tags_n = [list(ntag_vocab[p[:s]]) for p, s in zip(nperm, nsizes)]
    title_n = _join_words(
        words_arr[rng.integers(0, len(words_arr), (nn, 2))]) if nn else []
    desc_n = _join_words(
        words_arr[rng.integers(0, len(words_arr), (nn, 3))]) if nn else []

    # --- assemble + the loop generator's invalidity sprinkle --------------
    lat = np.concatenate([latlon[:, 0], latlon_n[:, 0]])
    lon = np.concatenate([latlon[:, 1], latlon_n[:, 1]])
    taken = np.concatenate([taken_e, taken_n])
    upload = np.concatenate([upload_e, upload_n])
    geo_bad = rng.random(n_rows) < 0.1
    lat[geo_bad] = np.nan
    lon[geo_bad] = np.nan
    taken[rng.random(n_rows) < 0.05] = 0.0

    df = pd.DataFrame({
        "id": np.arange(n_rows),
        "datetaken": taken, "dateupload": upload,
        "latitude": lat, "longitude": lon,
        "title": title_e + title_n, "description": desc_e + desc_n,
        "tags": tags_e + tags_n,
        "username": np.concatenate([user_e, user_n]),
        "event_id": np.concatenate([ev, np.zeros(nn, np.int64)]),
    })
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    eid = df["event_id"].to_numpy()
    df["is_event"] = (eid > 0).astype(int)
    df["event_type"] = np.where(eid == 0, 0, (eid - 1) % 3 + 1)
    return df
