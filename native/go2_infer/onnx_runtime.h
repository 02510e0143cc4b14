// Public API of the dependency-free ONNX executor (onnx_runtime.cpp).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace go2onnx {

struct Tensor {
  std::vector<float> f;
  std::vector<int64_t> idx;
  bool is_int = false;
  size_t size() const { return is_int ? idx.size() : f.size(); }
};

struct Graph;  // opaque

// Returns a heap-allocated graph, or nullptr on parse failure.
Graph* load_graph_file(const std::string& path);
void free_graph(Graph* g);

// Number of graph inputs/outputs and the declared input row width
// (0 if unknown).
size_t num_inputs(const Graph& g);
size_t num_outputs(const Graph& g);
// Declared width (product of dims beyond the batch dim) of graph input 0;
// 0 if the model omits shape info.
size_t input_width(const Graph& g);

bool run_graph(const Graph& g, const std::vector<const Tensor*>& inputs,
               std::vector<Tensor>* outputs);

}  // namespace go2onnx
