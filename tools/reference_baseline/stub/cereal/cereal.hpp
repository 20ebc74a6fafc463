// Minimal stub so the reference headers compile without the cereal
// submodule (not checked out in this snapshot). The benchmark never calls
// saveIndex/loadIndex, so the template members that use these symbols are
// never instantiated — declarations are enough.
#pragma once
#include <cstddef>
// transitive includes the real cereal provides and the reference relies on
#include <sstream>
#include <string>
#include <cstdint>

namespace cereal {

template <typename T>
struct BinaryData {
  T* data;
  std::size_t size;
};

template <typename T>
inline BinaryData<T> binary_data(T* data, std::size_t size) {
  return BinaryData<T>{data, size};
}

}  // namespace cereal
