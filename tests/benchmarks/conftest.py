def pytest_addoption(parser):
    parser.addoption("--run-tpu-bench", action="store_true", default=False,
                     help="run TPU benchmark harness tests")
