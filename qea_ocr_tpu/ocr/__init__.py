from qea_ocr_tpu.ocr.base import OcrBackend, get_ocr_helper  # noqa: F401
from qea_ocr_tpu.ocr.fake import FakeOcrBackend  # noqa: F401
from qea_ocr_tpu.ocr.engine import OcrQueryEngine, OcrResult  # noqa: F401
