import numpy as np

from hikma_engine_ray.functions.rules import (
    classify_file_type,
    detect_language,
    is_test_path,
    resolve_module,
)
from hikma_engine_ray.ids import (
    entity_id,
    file_id,
    file_ids_vec,
    repo_id,
    sha256_hex,
    sha256_vec,
)


def test_ids_deterministic():
    assert repo_id("org0/repo0") == repo_id("org0/repo0")
    assert len(repo_id("a")) == 16
    assert len(file_id("r", "c", "p")) == 20
    assert file_id("r", "c", "p") != file_id("r", "c", "q")
    assert entity_id("f", "Function", "x", 1, 0) != entity_id("f", "Function", "x", 2, 0)


def test_vectorized_matches_scalar():
    repos = np.array(["a/b", "c/d"], dtype=object)
    commits = np.array(["111", "222"], dtype=object)
    paths = np.array(["x.ts", "y.ts"], dtype=object)
    vec = file_ids_vec(repos, commits, paths)
    assert vec[0] == file_id("a/b", "111", "x.ts")
    assert vec[1] == file_id("c/d", "222", "y.ts")
    texts = np.array(["hello", ""], dtype=object)
    assert sha256_vec(texts)[0] == sha256_hex("hello")
    assert sha256_vec(texts)[1] == sha256_hex("")


def test_language_detection():
    assert detect_language("a/b.ts") == "typescript"
    assert detect_language("a/b.jsx") == "javascript"
    assert detect_language("x.py") == "python"
    assert detect_language("noext") == "unknown"
    assert detect_language("x/.eslintrc") == "unknown"


def test_file_type_classifier():
    # priority: vendor > test > config > dev > source (ast-parser.ts:300-331)
    assert classify_file_type("node_modules/x/y.test.ts") == "vendor"
    assert classify_file_type("src/__tests__/a.ts") == "test"
    assert classify_file_type("src/a.spec.ts") == "test"
    assert classify_file_type("package.json") == "config"
    assert classify_file_type("scripts/build.ts") == "dev"
    assert classify_file_type("src/lib/utils.ts") == "source"
    assert is_test_path("a/b.test.ts") and not is_test_path("a/b.ts")


def test_resolve_module():
    paths = {"src/lib/utils.ts", "src/pkg0/mod_0.ts", "src/pkg0/idx/index.ts"}
    assert resolve_module("src/pkg0/mod_1.ts", "../lib/utils", paths) == "src/lib/utils.ts"
    assert resolve_module("src/pkg0/mod_1.ts", "./mod_0", paths) == "src/pkg0/mod_0.ts"
    assert resolve_module("src/pkg0/mod_1.ts", "./idx", paths) == "src/pkg0/idx/index.ts"
    assert resolve_module("src/pkg0/mod_1.ts", "./nope", paths) == ""
    assert resolve_module("src/pkg0/mod_1.ts", "fs", paths) == ""
