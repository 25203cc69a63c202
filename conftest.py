# Root conftest: makes /root/repo importable inside pytest without an
# installed package (no pip in this environment).
