from sba_tpu.features.sift import (
    SiftExtractionOptions,
    SiftFeatures,
    extract_sift,
)
from sba_tpu.features.matching import (
    SiftMatchingOptions,
    match_descriptors,
    match_guided,
)
from sba_tpu.features.pairing import (
    exhaustive_pairs,
    sequential_pairs,
    spatial_pairs,
)
