"""String mixin (parity with ``ccvm_simulators/ccvmplotlib/utils/mixins.py``,
without the legacy ``future`` dependency)."""

import types


class StrDictMixIn:
    """__str__ returning a dict of all public, non-callable attributes."""

    def __str__(self):
        d = {}
        for key, value in self.__dict__.items():
            if (
                isinstance(value, types.FunctionType)
                or key.startswith("_")
                or callable(value)
                or value is None
            ):
                continue
            d[key] = value
        return str(d)
