"""Host-side input pipeline: patchify, expander topologies, datasets, batching."""

from .batch import FragmentBatch, PuzzleBatch, collate_puzzles  # noqa: F401
from .expander import cached_expander_mask, expander_mask, parse_degree, random_dropout_mask  # noqa: F401
from .patchify import ROT_VECTORS, grid_positions, make_puzzle, patchify, rotate_patches, unpatchify  # noqa: F401
from .datasets import ImageFolder, PuzzleDataset, SyntheticImages, get_dataset  # noqa: F401
from .prefetch import PrefetchIterator, prefetch  # noqa: F401
