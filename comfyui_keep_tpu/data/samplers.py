"""Samplers (reference wm_basicsr/data/data_sampler.py: EnlargedSampler).

Shards indices across data-parallel processes (jax.process_index /
process_count replace torch.distributed rank/world_size) with a dataset
enlarge ratio to avoid frequent epoch restarts.
"""
from typing import Iterator, Optional

import numpy as np


class EnlargedSampler:
    def __init__(self, dataset_size: int, num_replicas: Optional[int] = None,
                 rank: Optional[int] = None, ratio: int = 1):
        if num_replicas is None or rank is None:
            try:
                import jax
                num_replicas = num_replicas or jax.process_count()
                rank = rank if rank is not None else jax.process_index()
            except Exception:  # pragma: no cover
                num_replicas, rank = 1, 0
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = int(np.ceil(dataset_size * ratio / num_replicas))
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self.epoch)
        indices = g.permutation(self.total_size)
        indices = (indices % self.dataset_size).tolist()
        return iter(indices[self.rank:self.total_size:self.num_replicas])

    def __len__(self):
        return self.num_samples
