from qea_ocr_tpu.tracking.history import LabelHistory  # noqa: F401
from qea_ocr_tpu.tracking.weights import (  # noqa: F401
    WEIGHTGEN_METHODS,
    attention_weights,
    decaying_weights,
    levenshtein_weights,
    weightgenerator_factory,
)
from qea_ocr_tpu.tracking.loss import weighted_ctc_loss  # noqa: F401
