# Debias family. The reference ships an EMPTY debias package
# (recstudio/model/debias/__init__.py is 0 bytes); this one is functional:
# IPSBPR (inverse-propensity-scored BPR, Saito et al. WSDM'20) and PDA
# (popularity-bias deconfounded training, Zhang et al. SIGIR'21).
