from uckg_ray.functions.scalars import (  # noqa: F401
    capec_label,
    consequence_strings,
    execution_flow_strings,
    format_ts_millis_arrow,
    json_compact,
    skill_strings,
    titles_to_json,
    truncate_long_fraction,
)
