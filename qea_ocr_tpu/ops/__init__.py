from qea_ocr_tpu.ops.ctc import (  # noqa: F401
    ctc_loss_mean,
    ctc_loss_samplewise,
    greedy_decode,
)
from qea_ocr_tpu.ops.edit_distance import (  # noqa: F401
    batched_levenshtein,
    cer_from_labels,
    compare_labels_device,
)
from qea_ocr_tpu.ops.text_stack import get_text_stack  # noqa: F401
from qea_ocr_tpu.ops.transforms import add_gaussian_noise, pad_white_array  # noqa: F401
from qea_ocr_tpu.ops.entropy import normalized_entropy, mean_sequence_entropy  # noqa: F401
