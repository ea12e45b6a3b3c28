from .tables import (
    reference_tables, table_entry, build_tk_plan, build_svd_plan,
    build_tt_conv_plan, build_tt_linear_plan,
)
