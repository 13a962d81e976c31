from sba_tpu.sfm.incremental_triangulator import (
    IncrementalTriangulator,
    TriangulatorOptions,
)
from sba_tpu.sfm.incremental_mapper import (
    IncrementalMapper,
    IncrementalMapperOptions,
)
