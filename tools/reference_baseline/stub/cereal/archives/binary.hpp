#pragma once
#include <iosfwd>

namespace cereal {
class BinaryOutputArchive {
 public:
  explicit BinaryOutputArchive(std::ostream&) {}
  template <typename... Args>
  void operator()(Args&&...) {}
};
class BinaryInputArchive {
 public:
  explicit BinaryInputArchive(std::istream&) {}
  template <typename... Args>
  void operator()(Args&&...) {}
};
}  // namespace cereal
