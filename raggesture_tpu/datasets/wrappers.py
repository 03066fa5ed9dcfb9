"""Dataset wrappers (reference mogen/datasets/dataset_wrappers.py:7-41)."""

from __future__ import annotations

import bisect
from typing import Sequence


class ConcatDataset:
    """Concatenation of multiple datasets (same record schema)."""

    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cumulative.append(total)

    def __len__(self):
        return self.cumulative[-1]

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        ds = bisect.bisect_right(self.cumulative, idx)
        prev = self.cumulative[ds - 1] if ds > 0 else 0
        return self.datasets[ds][idx - prev]


class RepeatDataset:
    """Repeats a dataset ``times`` times to cut epoch bookkeeping overhead."""

    def __init__(self, dataset, times: int):
        assert times >= 1
        self.dataset = dataset
        self.times = times
        self._len = len(dataset) * times

    def __len__(self):
        return self._len

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += self._len
        if not 0 <= idx < self._len:
            raise IndexError(idx)
        return self.dataset[idx % len(self.dataset)]
