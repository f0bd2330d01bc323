"""dgl.function builtins used by the reference: fn.sum(msg=..., out=...)."""


class _BuiltinSum:
    def __init__(self, msg_field: str, out_field: str):
        self.msg_field = msg_field
        self.out_field = out_field


def sum(msg: str, out: str) -> _BuiltinSum:  # noqa: A001 (DGL's own name)
    return _BuiltinSum(msg, out)
