from .scalars import (
    clean_array_string,
    comma_split,
    date_partition_key,
    epoch_millis_to_ts,
    epoch_seconds_to_ts,
    format_cents,
    html_strip,
    initial_price,
    initial_price_cents,
    parse_discount,
    parse_release_date,
    to_cents,
)

__all__ = [
    "clean_array_string",
    "comma_split",
    "date_partition_key",
    "epoch_millis_to_ts",
    "epoch_seconds_to_ts",
    "format_cents",
    "html_strip",
    "initial_price",
    "initial_price_cents",
    "parse_discount",
    "parse_release_date",
    "to_cents",
]
