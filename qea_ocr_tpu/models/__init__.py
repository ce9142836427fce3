from qea_ocr_tpu.models.crnn import CRNN, ConvStack  # noqa: F401
from qea_ocr_tpu.models.unet import UNet, UNetBlock  # noqa: F401
from qea_ocr_tpu.models.attention import HistoryAttention  # noqa: F401
