"""Wire-format constants, tables and container headers (see FORMAT.md)."""

from sqz_tpu.formats.constants import (  # noqa: F401
    LEN_BASE,
    LEN_XB,
    POS_BASE,
    POS_XB,
    build_len_index,
    build_pos_index,
    SQUEEZE_MIN_WIN_BITS,
    SQUEEZE_MAX_WIN_BITS,
    SQUEEZE_LEN_MIN,
    SQUEEZE_LEN_MAX,
    SQUEEZE_LIT_NYT,
    SQUEEZE_POS_NYT,
    SQZ4_MIN_LEN,
    SQZ4_MAX_LEN,
    SQZ4_MAGIC,
    SQZT_MAGIC,
)
