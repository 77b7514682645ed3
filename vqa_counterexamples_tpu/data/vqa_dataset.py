"""VQA classification dataset: processed examples + feature store -> batches.

Replaces the reference dataset/loader stack (``vqa/datasets/vqa.py`` +
``vqa/lib/dataloader.py`` worker processes) with a vectorized host pipeline:
all question/answer tensors are precomputed as int32 arrays once, visual
features are gathered on device by row index inside the jitted step (noatt)
or prefetched per batch (att maps).  ``samplingans=True`` draws the train
answer from the 10 human answers weighted by occurrence count
(reference vqa.py:62-76).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .features import FeatureStore


class VQAArrays:
    def __init__(self, examples: list, store: FeatureStore,
                 samplingans: bool = False):
        self.examples = examples
        self.store = store
        self.samplingans = samplingans
        n = len(examples)
        maxlength = len(examples[0]["question_wids"])
        self.question_wids = np.empty((n, maxlength), dtype=np.int32)
        self.answer_aids = np.empty((n,), dtype=np.int32)
        self.image_rows = np.empty((n,), dtype=np.int32)
        self.question_ids = np.empty((n,), dtype=np.int64)
        # ragged answer-occurrence lists for sampling
        self._ans_aid: list = []
        self._ans_p: list = []
        for i, ex in enumerate(examples):
            self.question_wids[i] = ex["question_wids"]
            self.answer_aids[i] = ex.get("answer_aid", 0)
            self.image_rows[i] = store.name_to_index[ex["image_name"]]
            self.question_ids[i] = ex["question_id"]
            if samplingans and ex.get("answers_aid"):
                counts = np.asarray(ex["answers_count"], dtype=np.float64)
                self._ans_aid.append(np.asarray(ex["answers_aid"],
                                                dtype=np.int32))
                self._ans_p.append(counts / counts.sum())
            else:
                self._ans_aid.append(None)
                self._ans_p.append(None)

    @property
    def size(self) -> int:
        return self.question_wids.shape[0]

    def sample_answers(self, idx: np.ndarray,
                       rng: np.random.Generator) -> np.ndarray:
        out = self.answer_aids[idx].copy()
        if self.samplingans:
            for j, i in enumerate(idx):
                if self._ans_aid[i] is not None:
                    out[j] = rng.choice(self._ans_aid[i], p=self._ans_p[i])
        return out

    def batches(self, batch_size: int, *, shuffle: bool = True,
                rng: np.random.Generator | None = None,
                drop_remainder: bool = False,
                device_features=None) -> Iterator[dict]:
        """Yield {visual, question, answer, question_id} batches.

        When ``device_features`` is given (an HBM-resident jax array), the
        batch carries an on-device gather; otherwise the host gathers feature
        rows (att-map case) with the NEXT batch's gather prefetched — by the
        native C++ store's async tickets into ping-pong buffers when the
        matrix is npy-backed, else on a worker thread (the role of the
        reference loader's worker processes, dataloader.py:126-155).

        On the native path each yielded ``visual`` is a view of a reused
        buffer, valid until the second following iteration; consume it (the
        jitted step's host->device copy does) before advancing twice.
        """
        from concurrent.futures import ThreadPoolExecutor

        rng = rng or np.random.default_rng()
        order = np.arange(self.size)
        if shuffle:
            rng.shuffle(order)

        starts = list(range(0, self.size, batch_size))
        if drop_remainder:
            starts = [s for s in starts if s + batch_size <= self.size]

        def idx_at(i):
            return order[starts[i]:starts[i] + batch_size]

        def assemble(i, visual):
            idx = idx_at(i)
            return {
                "question": self.question_wids[idx],
                "answer": self.sample_answers(idx, rng),
                "question_id": self.question_ids[idx],
                "visual": visual,
            }

        if device_features is not None:
            import jax.numpy as jnp
            for i in range(len(starts)):
                rows = jnp.asarray(self.image_rows[idx_at(i)])
                yield assemble(i, jnp.take(device_features, rows, axis=0))
            return

        if not starts:
            return

        # native C++ prefetch ping-pong: the mmap/thread-pool store gathers
        # batch i+1 into the idle buffer while the device consumes batch i
        # (reference dataloader.py:126-155 worker role, without the processes)
        first_rows = self.image_rows[idx_at(0)]
        row_shape = self.store.row_shape
        cols = int(np.prod(row_shape))
        buf_dtype = getattr(self.store, "dtype", np.dtype(np.float32))
        bufs = [np.empty((batch_size, cols), buf_dtype) for _ in range(2)]
        ticket = self.store.prefetch_rows(first_rows, bufs[0][:len(first_rows)])
        if ticket is not None:
            for i in range(len(starts)):
                rows = self.image_rows[idx_at(i)]
                self.store.wait_rows(ticket)
                if i + 1 < len(starts):
                    nxt = self.image_rows[idx_at(i + 1)]
                    ticket = self.store.prefetch_rows(
                        nxt, bufs[(i + 1) % 2][:len(nxt)])
                visual = bufs[i % 2][:len(rows)].reshape(len(rows), *row_shape)
                yield assemble(i, visual)
            return

        with ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(self.store.gather_rows,
                                 self.image_rows[idx_at(0)])
            for i in range(len(starts)):
                visual = future.result()
                if i + 1 < len(starts):
                    future = pool.submit(self.store.gather_rows,
                                         self.image_rows[idx_at(i + 1)])
                yield assemble(i, visual)
