from .audit import (assert_broadcast_join, assert_no_cartesian,  # noqa: F401
                    assert_pushed_filters, explain_str, plan_report)
