from qea_ocr_tpu.utils.charmap import (  # noqa: F401
    CharMap,
    get_char_maps,
    get_ununicode,
)
