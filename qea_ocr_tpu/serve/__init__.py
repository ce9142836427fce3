from qea_ocr_tpu.serve.cleaner import DocumentCleaner  # noqa: F401
