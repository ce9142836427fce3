"""Selection-strategy tests: given fixed CER tables, assert chosen indices
(SURVEY.md §4 mandated goldens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.selection import (
    datasampler_factory,
    is_global,
    membership_mask,
    select_batch,
    select_global_random,
    select_global_uniform,
)


class TestSelectBatchKernel:
    def test_budget_formula(self):
        """k = max(1, ceil(n_valid * (1 - prop))) per document."""
        D, S = 3, 8
        est = jnp.zeros((D, S))
        valid = jnp.array([[True] * 8, [True] * 5 + [False] * 3, [True] + [False] * 7])
        mask, k = select_batch("random", jax.random.PRNGKey(0), est, valid, 0.75)
        np.testing.assert_array_equal(np.asarray(k), [2, 2, 1])
        assert np.array_equal(np.asarray(mask).sum(1), np.asarray(k))
        # never selects invalid slots
        assert not np.any(np.asarray(mask) & ~np.asarray(valid))

    def test_budget_formula_float_wobble_parity(self):
        """25 strips at prop=0.96: 25*(1-0.96) lands above 1.0 in both
        python float64 (reference `math.ceil(num*(1-prop))`,
        train_nn_patch.py:255-256) and device float32, so BOTH select k=2
        (an 8% effective budget, not 4%). Pin the parity: anyone "fixing"
        the wobble on one side silently diverges budget accounting from the
        reference. An exact 4% floor uses prop=0.961 (see CLAUDE.md)."""
        import math
        assert math.ceil(25 * (1 - 0.96)) == 2  # reference-side behavior
        est = jnp.zeros((1, 25))
        valid = jnp.ones((1, 25), bool)
        _, k = select_batch("random", jax.random.PRNGKey(0), est, valid, 0.96)
        np.testing.assert_array_equal(np.asarray(k), [2])
        _, k = select_batch("random", jax.random.PRNGKey(0), est, valid, 0.961)
        np.testing.assert_array_equal(np.asarray(k), [1])

    def test_topk_selects_worst(self):
        est = jnp.asarray([[0.1, 0.9, 0.5, 0.8, 0.0, 0.3]])
        valid = jnp.ones((1, 6), bool)
        mask, k = select_batch("topKCER", jax.random.PRNGKey(0), est, valid, 0.5)
        assert int(k[0]) == 3
        np.testing.assert_array_equal(
            np.sort(np.nonzero(np.asarray(mask[0]))[0]), [1, 2, 3]
        )

    def test_topk_ignores_invalid(self):
        est = jnp.asarray([[0.1, 0.9, 0.5, 0.8]])
        valid = jnp.asarray([[True, False, True, True]])
        mask, k = select_batch("topKCER", jax.random.PRNGKey(0), est, valid, 0.5)
        sel = set(np.nonzero(np.asarray(mask[0]))[0].tolist())
        assert 1 not in sel and len(sel) == int(k[0]) == 2
        assert sel == {2, 3}

    def test_range_covers_spread(self):
        # With one strip far from the others, range selection should pick it
        # much more often than proportional random would.
        est = jnp.asarray([[0.0, 0.01, 0.02, 0.03, 1.0]])
        valid = jnp.ones((1, 5), bool)
        hits = 0
        for s in range(50):
            mask, k = select_batch("rangeCER", jax.random.PRNGKey(s), est, valid, 0.6)
            assert int(np.asarray(mask).sum()) == int(k[0]) == 2
            hits += bool(np.asarray(mask)[0, 4])
        assert hits > 40  # outlier nearly always claimed

    def test_range_duplicate_claims_deterministic(self):
        """Estimates AT the 100.0 claimed-slot sentinel make every uniform
        point re-claim the same slot (reference re-claimable quirk,
        `selection_utils.py:127-134`): the rank scatter then carries
        duplicate indices, and the min-combine must make the FIRST claim
        win deterministically (plain `.set` scatter has an XLA-undefined
        winner)."""
        from qea_ocr_tpu.selection.samplers import _BIG_RANK, range_ranks

        S = 6
        est = jnp.full((S,), 100.0)
        valid = jnp.ones((S,), bool)
        for seed in range(8):
            ranks = np.asarray(
                jax.jit(range_ranks)(jax.random.PRNGKey(seed), est, valid))
            # every point claims slot 0 (argmin tie -> first); first claim
            # (rank 0) must win and no other slot is ever ranked.
            assert ranks[0] == 0, ranks
            np.testing.assert_array_equal(ranks[1:], _BIG_RANK)
        # duplicate claims shrink the effective pick set below k, exactly
        # like the reference's picked-list duplicates.
        mask, k = select_batch(
            "rangeCER", jax.random.PRNGKey(0), est[None], valid[None], 0.5)
        assert int(k[0]) == 3 and int(np.asarray(mask).sum()) == 1

    def test_random_is_uniformish(self):
        est = jnp.zeros((1, 8))
        valid = jnp.ones((1, 8), bool)
        counts = np.zeros(8)
        for s in range(64):
            mask, _ = select_batch("random", jax.random.PRNGKey(s), est, valid, 0.75)
            counts += np.asarray(mask[0])
        assert counts.min() > 4  # every slot occasionally chosen


class TestGlobalSelection:
    def test_uniform_buckets(self):
        rng = np.random.default_rng(0)
        cers = np.linspace(0, 1, 100).astype(np.float32)
        bitmap = select_global_uniform(rng, cers, 10)
        assert bitmap.sum() == 10
        # one per decile
        chosen = np.nonzero(bitmap)[0]
        assert len(set(chosen // 10)) == 10

    def test_random_bitmap(self):
        rng = np.random.default_rng(0)
        bitmap = select_global_random(rng, np.zeros(50, np.float32), 7)
        assert bitmap.sum() == 7

    def test_membership_mask(self):
        bitmap = jnp.asarray([True, False, True, False])
        ids = jnp.asarray([[0, 1], [2, 3]])
        m = membership_mask(ids, bitmap)
        np.testing.assert_array_equal(np.asarray(m), [[True, False], [True, False]])

    def test_is_global(self):
        assert is_global("uniformCERglobal") and is_global("randomglobal")
        assert not is_global("rangeCER") and not is_global(None)


class TestSamplerAPI:
    """Reference-shaped class API (`query`/`update_cer`) parity checks."""

    def test_factory_keys(self):
        for key in ["random", "topKCER", "uniformCERglobal", "randomglobal",
                    "rangeCER", "uniformEntropy"]:
            assert datasampler_factory(key) is not None
        with pytest.raises(KeyError):
            datasampler_factory("uniformCER")  # reference CLI typo -> KeyError

    def test_topk_query(self):
        cls = datasampler_factory("topKCER")
        sampler = cls({"a": 0.9, "b": 0.1, "c": 0.5})
        imgs = np.arange(3)[:, None]
        sel_imgs, sel_labels, idx = sampler.query(imgs, ["A", "B", "C"], 2, ["a", "b", "c"])
        np.testing.assert_array_equal(np.sort(idx), [0, 2])  # worst two: a, c
        assert set(sel_labels) == {"A", "C"}

    def test_update_cer_history(self):
        cls = datasampler_factory("random")
        s = cls({"a": 0.5})
        s.update_cer([0.2, 0.7], ["a", "b"])
        assert s.cers["a"] == pytest.approx(0.2)
        assert s.all_cers == {"a": [0.2], "b": [0.7]}

    def test_global_select_and_query(self):
        cls = datasampler_factory("randomglobal")
        s = cls({f"n{i}": i / 10 for i in range(10)}, num_samples=3)
        s.select_samples()
        assert len(s.selected_samplenames) == 3
        imgs = np.arange(10)[:, None]
        names = [f"n{i}" for i in range(10)]
        _, _, idx = s.query(imgs, names, names=names)
        assert len(idx) == 3


def test_canonical_keys_match_factories():
    """config.SELECTION_KEYS / WEIGHTGEN_KEYS are the single source of truth
    for CLI choices and quality-run validation — they must stay in lockstep
    with the actual factories."""
    from qea_ocr_tpu.config import SELECTION_KEYS, WEIGHTGEN_KEYS
    from qea_ocr_tpu.selection.api import datasampler_factory
    from qea_ocr_tpu.tracking.weights import WEIGHTGEN_METHODS
    for key in SELECTION_KEYS:
        assert datasampler_factory(key) is not None
    import pytest
    with pytest.raises(KeyError):
        datasampler_factory("uniformCER")  # the reference's CLI typo
    assert set(WEIGHTGEN_KEYS) == set(WEIGHTGEN_METHODS)
