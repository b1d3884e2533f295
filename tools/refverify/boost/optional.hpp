// self-contained boost::optional shim (verification build only).
// Value types need default-constructibility (true for all uses in this
// codebase); reference types are pointer-backed.
#ifndef BOOST_OPTIONAL_SHIM
#define BOOST_OPTIONAL_SHIM
#include <stdexcept>
namespace boost {
  struct none_t { constexpr none_t() {} };
  inline constexpr none_t none;
  template <class T> class optional {
    T v_{};
    bool has_ = false;
  public:
    optional() {}
    optional(none_t) {}
    optional(const T &x) : v_(x), has_(true) {}
    optional &operator=(const T &x) { v_ = x; has_ = true; return *this; }
    optional &operator=(none_t) { has_ = false; return *this; }
    explicit operator bool() const { return has_; }
    const T &operator*() const { return v_; }
    T &operator*() { return v_; }
    const T *operator->() const { return &v_; }
    T *operator->() { return &v_; }
    // real boost::optional::value() throws on empty (bad_optional_access);
    // the first shim version silently returned a default, which MASKED a
    // genuine agree-on-error case (no-MediaBox documents) in round 2
    const T &value() const {
      if (!has_) throw std::runtime_error("bad optional access");
      return v_;
    }
  };
  template <class T> class optional<T&> {
    T *p = nullptr;
  public:
    optional() {}
    optional(none_t) {}
    optional(T &r) : p(&r) {}
    explicit operator bool() const { return p != nullptr; }
    T &operator*() const { return *p; }
    T *operator->() const { return p; }
  };
}
#endif
