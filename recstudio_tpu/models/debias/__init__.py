# Debias family placeholder — the reference ships an empty debias package
# (recstudio/model/debias/__init__.py is 0 bytes); kept for registry parity.
