from .catalog import (  # noqa: F401
    DIMENSION_TABLES,
    TABLE_NAMES,
    TABLE_SCHEMAS,
    load_all,
    read_csv,
    read_json,
    read_orc,
    read_text,
    register_views,
    table,
    write_orc,
    write_parquet,
)
