"""data/datasets.py: lazy mmap-backed pretrain loading.

``load_pretrain`` used to ``np.concatenate`` every shard into RAM and then
fancy-index a permuted second copy (~2x corpus peak RSS — round-3 review);
it now returns :class:`ShardedWindows` views that gather only the requested
batch rows from the mmaps while selecting exactly the same rows."""
import os

import numpy as np

from pianobart_tpu.data.datasets import ShardedWindows, load_pretrain


def _write_corpus(root, sizes):
    shards = []
    base = 0
    for i, n in enumerate(sizes):
        ds = f"d{i}"
        os.makedirs(os.path.join(root, ds), exist_ok=True)
        arr = (np.arange(n)[:, None, None] + base) * np.ones(
            (n, 4, 8), dtype=np.int64)
        np.save(os.path.join(root, ds, f"{ds}_train_split.npy"), arr)
        shards.append(arr)
        base += n
    return np.concatenate(shards, axis=0)


def test_load_pretrain_matches_eager_concat(tmp_path):
    eager = _write_corpus(str(tmp_path), [5, 3, 7])
    datasets = ["d0", "d1", "d2"]
    tr, va = load_pretrain(str(tmp_path), datasets, valid_fraction=0.2,
                           seed=7)
    # identical row selection to the old concat -> permute -> split
    rng = np.random.default_rng(7)
    idx = rng.permutation(len(eager))
    split = int(len(eager) * 0.8)
    np.testing.assert_array_equal(np.asarray(tr), eager[idx[:split]])
    np.testing.assert_array_equal(np.asarray(va), eager[idx[split:]])
    assert tr.shape == (split, 4, 8)
    assert len(va) == len(eager) - split


def test_sharded_windows_indexing(tmp_path):
    eager = _write_corpus(str(tmp_path), [4, 6])
    shards = [np.load(os.path.join(tmp_path, f"d{i}",
                                   f"d{i}_train_split.npy"), mmap_mode="r")
              for i in range(2)]
    order = np.random.default_rng(0).permutation(10)
    view = ShardedWindows(shards, order)
    ref = eager[order]
    # batch gather across shard boundaries, int, and slice access
    sel = np.array([9, 0, 4, 4, 7])
    np.testing.assert_array_equal(view[sel], ref[sel])
    np.testing.assert_array_equal(view[3], ref[3])
    np.testing.assert_array_equal(view[2:8], ref[2:8])
    assert view.dtype == ref.dtype


def test_batch_iterator_over_sharded_windows(tmp_path):
    _write_corpus(str(tmp_path), [5, 6])
    tr, va = load_pretrain(str(tmp_path), ["d0", "d1"], valid_fraction=0.3,
                           seed=1)
    from pianobart_tpu.train.pretrain import batch_iterator
    seen = 0
    for batch, w in batch_iterator(va, 2, np.random.default_rng(0),
                                   shuffle=False, drop_last=False):
        assert batch.shape[0] == 2 and batch.shape[1:] == (4, 8)
        seen += int(w.sum())
    assert seen == len(va)   # padded tail included, every sample weighted
