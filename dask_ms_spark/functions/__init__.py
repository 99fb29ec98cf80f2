from . import complexf, text, vector
