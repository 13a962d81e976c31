from sba_tpu.retrieval.vocab_tree import (
    VocabTree,
    build_vocab_tree,
    quantize_descriptors,
)
from sba_tpu.retrieval.visual_index import VisualIndex
