from qea_ocr_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    put_batch,
    put_replicated,
    replicated,
)
