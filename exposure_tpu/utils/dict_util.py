"""Attribute-style dict used for configs.

Parity: the reference's config objects are attribute dicts holding scalars,
callables and classes (reference util.py:40-72); configs address knobs as
``cfg.batch_size`` etc.  We keep the same access pattern so config files can
be written with identical knob names.
"""


class Dict(dict):
    """A dict whose items are also attributes.

    >>> d = Dict(a=1); d.b = 2; (d.a, d['b'])
    (1, 2)
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if isinstance(arg, dict):
                for k, v in arg.items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, attr):
        try:
            return self[attr]
        except KeyError as e:
            raise AttributeError(attr) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, item):
        del self[item]

    def copy(self):
        return Dict(self)


def merge_dict(a, b):
    """Merge two dicts, erroring on key collisions (reference util.py:297-304)."""
    ret = a.copy()
    for key, val in b.items():
        if key in ret:
            raise KeyError("Item %r already exists" % key)
        ret[key] = val
    return ret
