from .cleaning import (  # noqa: F401
    FREE_LABEL,
    GAMES_SCHEMA,
    developer_key,
    genres_array,
    in_reference_year_range,
    month_str,
    owners_range,
    price_category,
    revenue,
    strip_list_syntax,
    with_derived,
    year_str,
)
