from uckg_ray.functions.scalars import (  # noqa: F401
    format_ts_millis_arrow,
    truncate_long_fraction,
    titles_to_lang_string,
)
