"""--mesh data-parallel CLI training on the virtual 8-device mesh."""

from vqa_counterexamples_tpu.cli import counterexamples as cx_cli


def test_counterexamples_cli_mesh_dp(tmp_path):
    info = cx_cli.main([
        "--cx_model", "NeuralModel", "--epochs", "1", "--synthetic", "128",
        "--batch_size", "32", "--mesh", "data=8",
        "--project_dir", str(tmp_path)])
    assert len(info) == 1
    assert 0.0 <= info[0]["recall"] <= 1.0


def test_parse_mesh():
    assert cx_cli.parse_mesh("data=8") == {"data": 8}
    assert cx_cli.parse_mesh("data=4,model=2") == {"data": 4, "model": 2}
    assert cx_cli.parse_mesh(None) is None
