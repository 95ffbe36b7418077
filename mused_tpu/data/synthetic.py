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
                               noise_rate: float = 0.4, seed: int = 0) -> pd.DataFrame:
    """SED2012-shaped DataFrame with planted multimodal events.

    Each event has a home (lat, lon), a time window, a user pool, a tag
    vocabulary, and a text vocabulary; noise rows draw uniformly.  Labels:
    event_id in 1..n_events (0 = noise), is_event, event_type in {0,1,2,3}.
    """
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
