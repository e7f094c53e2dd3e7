from .pg_types import (  # noqa: F401
    field_errors,
    lsn_str,
    pg_char,
    pg_enum,
    pg_int,
    pg_text_to_bool,
    pg_timestamp,
    str_to_lsn_col,
    try_typed,
    typed_columns,
)
