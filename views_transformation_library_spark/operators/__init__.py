"""Operator modules. Every operator is a pure ``DataFrame -> DataFrame``
function over the panel contract (see ``panel.py``)."""
